"""Visualization layer smoke tests."""

import os

import numpy as np

from pips_tpu.utils.improc import (Summ_writer, back2color, draw_trajs_on_rgb,
                                   draw_trajs_on_rgbs, pca_feat_vis,
                                   preprocess_color, write_gif)
from pips_tpu.utils.logging import MetricWriter


def test_color_roundtrip(rng):
    rgb = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
    np.testing.assert_array_equal(back2color(preprocess_color(rgb)), rgb)


def test_draw_trajs(rng):
    rgb = np.zeros((32, 48, 3), np.uint8)
    trajs = (rng.rand(4, 3, 2) * [46, 30] + 1).astype(np.float32)
    out = draw_trajs_on_rgb(rgb, trajs, linewidth=1)
    assert out.shape == rgb.shape
    assert out.sum() > 0  # something was drawn
    frames = draw_trajs_on_rgbs(np.stack([rgb] * 4), trajs)
    assert frames.shape == (4, 32, 48, 3)


def test_pca_feat_vis(rng):
    feat = rng.randn(16, 20, 8).astype(np.float32)
    vis = pca_feat_vis(feat)
    assert vis.shape == (16, 20, 3)
    assert vis.dtype == np.uint8


def test_summ_writer_gating(tmp_path, rng):
    writer = MetricWriter(str(tmp_path), use_tensorboard=False)
    sw = Summ_writer(writer, global_step=10, log_freq=5, scalar_freq=2)
    assert sw.save_this
    sw.summ_scalar("loss", 1.5)
    rgb = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    sw.summ_rgbs("vid", [rgb, rgb])
    gifs = [f for f in os.listdir(sw.media_dir)] if os.path.isdir(sw.media_dir) else []
    assert any(f.endswith(".gif") for f in gifs)

    sw2 = Summ_writer(writer, global_step=11, log_freq=5, scalar_freq=2)
    assert not sw2.save_this
    sw2.summ_scalar("loss", 2.0)  # odd step: gated out
    with open(writer.path) as f:
        lines = f.readlines()
    assert len(lines) == 1
    writer.close()


def test_write_gif(tmp_path, rng):
    frames = [(rng.rand(8, 8, 3) * 255).astype(np.uint8) for _ in range(3)]
    path = str(tmp_path / "x.gif")
    write_gif(path, frames, fps=4)
    assert os.path.getsize(path) > 0


def test_draw_circles_and_fcp_vis(rng):
    from pips_tpu.utils.improc import draw_circles_at_xy, render_fcp_vis
    blobs = draw_circles_at_xy(np.array([[3.0, 2.0]]), 8, 10, sigma=1.0)
    assert blobs.shape == (1, 8, 10)
    assert blobs[0, 2, 3] == blobs.max()

    fcps = rng.rand(4, 2, 8, 10).astype(np.float32)   # (S, I, H8, W8)
    coords = rng.rand(2, 4, 2).astype(np.float32) * 64  # (I, S, 2)
    frames = render_fcp_vis(fcps, coords, stride=8)
    assert frames.shape == (8, 8, 10, 3)
    assert frames.dtype == np.uint8


def test_colormap_2d_and_seq2color(rng):
    from pips_tpu.utils.improc import colormap_2d, draw_trajs_on_rgbs2, seq2color

    rgb = colormap_2d(np.array([0.0, 1.0]), np.array([0.0, 1.0]))
    assert rgb.shape == (2, 3)
    assert not (rgb[0] == rgb[1]).all()  # distinct corners

    seq = np.zeros((3, 8, 10), np.float32)
    seq[0, 2, 3] = 1.0
    seq[2, 5, 7] = 1.0
    img = seq2color(seq)
    assert img.shape == (8, 10, 3)
    assert img[2, 3].any() and img[5, 7].any()
    assert not (img[2, 3] == img[5, 7]).all()  # different times -> colors

    rgbs = np.zeros((3, 32, 40, 3), np.uint8)
    trajs = (rng.rand(3, 2, 2) * [38, 30] + 1).astype(np.float32)
    vis = np.array([[1, 0], [1, 1], [0, 1]], np.float32)
    frames = draw_trajs_on_rgbs2(rgbs, trajs, vis)
    assert frames.shape == rgbs.shape
    assert frames.sum() > 0


def test_flow2color(rng):
    from pips_tpu.utils.improc import flow2color

    flow = (rng.randn(2, 16, 24, 2) * 20).astype(np.float32)
    out = flow2color(flow, clip=50.0)
    assert out.shape == (2, 16, 24, 3) and out.dtype == np.uint8

    # zero flow -> black (value = radius = 0)
    assert flow2color(np.zeros((4, 4, 2), np.float32)).max() == 0

    # HSV->RGB matches matplotlib's converter
    try:
        from matplotlib.colors import hsv_to_rgb
    except ImportError:
        return
    f = np.clip(flow[0], -50, 50) / 50.0
    radius = np.clip(np.sqrt((f ** 2).sum(-1)), 0, 1)
    hue = np.clip((np.arctan2(f[..., 1], f[..., 0]) / np.pi + 1) / 2, 0, 1)
    hsv = np.stack([hue, np.full_like(hue, 0.75), radius], -1)
    want = (hsv_to_rgb(hsv) * 255).astype(np.uint8)
    assert np.abs(out[0].astype(int) - want.astype(int)).max() <= 1

    # per-image normalization branch (clip=0)
    out0 = flow2color(flow, clip=0.0)
    assert out0.shape == (2, 16, 24, 3)


def test_summ_flow(tmp_path, rng):
    from pips_tpu.utils.improc import flow2color  # noqa: F401
    writer = MetricWriter(str(tmp_path))
    sw = Summ_writer(writer, global_step=100, log_freq=100)
    flow = (rng.randn(16, 24, 2) * 5).astype(np.float32)
    img = sw.summ_flow("t/flow", flow)
    assert img.shape == (16, 24, 3)
    frames = sw.summ_flows("t/flows", [flow, flow * 2])
    assert frames.shape == (2, 16, 24, 3)
    writer.close()


def test_summ_soft_seg_thr(tmp_path):
    """Thresholded colorized soft seg (reference test_on_badja.py:133 call
    sites — the method itself is absent upstream)."""
    from pips_tpu.utils.improc import Summ_writer, draw_circles_at_xy
    from pips_tpu.utils.logging import MetricWriter

    sw = Summ_writer(MetricWriter(str(tmp_path), use_tensorboard=False), 0,
                     log_freq=1)
    kp = draw_circles_at_xy(np.array([[4.0, 4.0], [12.0, 10.0]]), 16, 20,
                            sigma=2.0)
    colors = np.array([[255, 0, 0], [0, 0, 255]], np.uint8)
    img = sw.summ_soft_seg_thr("seg", kp, label_colors=colors,
                               only_return=True)
    assert img.shape == (16, 20, 3) and img.dtype == np.uint8
    assert img[4, 4, 0] > 200 and img[4, 4, 2] == 0      # red blob at (4,4)
    assert img[10, 12, 2] > 200 and img[10, 12, 0] == 0  # blue at xy (12,10)
    assert img[0, 19].sum() == 0                         # background empty


def test_badja_kp_vis_gif(tmp_path):
    from pips_tpu.evals.run_badja import write_kp_vis

    T, H, W, N = 3, 24, 32, 5
    rng = np.random.RandomState(0)
    rgbs = rng.rand(T, H, W, 3).astype(np.float32) * 255
    trajs = rng.rand(T, N, 2).astype(np.float32) * [W - 4, H - 4] + 2
    path = write_kp_vis(str(tmp_path), "testvid", rgbs, trajs)
    import os
    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_summ_traj2ds_on_rgbs2_and_pts(tmp_path, rng):
    """Reference-parity summaries (utils/improc.py:701-817): visibility-coded
    circles, valid-filtered lines, per-frame point markers, raw gif."""
    writer = MetricWriter(str(tmp_path), use_tensorboard=False)
    sw = Summ_writer(writer, global_step=0, log_freq=1)
    S, N, H, W = 4, 3, 32, 48
    rgbs = np.zeros((S, H, W, 3), np.uint8)
    trajs = (rng.rand(S, N, 2) * [W - 4, H - 4] + 2).astype(np.float32)
    vis = (rng.rand(S, N) > 0.5).astype(np.float32)
    valids = np.ones((S, N), np.float32)
    valids[:, -1] = 0  # last point invalid in every frame -> no line drawn

    frames = sw.summ_traj2ds_on_rgbs2("t2", trajs, vis, rgbs, valids=valids)
    assert frames.shape == (S, H, W, 3) and frames.sum() > 0
    assert os.path.exists(os.path.join(str(tmp_path), "media", "00000000_t2.gif"))

    pts = sw.summ_pts_on_rgbs("pts", trajs, rgbs, valids=valids)
    assert pts.shape == (S, H, W, 3) and pts.sum() > 0
    # invalid point drew nothing: compare against drawing with all-valid
    pts_all = sw.summ_pts_on_rgbs("pts_all", trajs, rgbs, only_return=True)
    assert pts_all.sum() > pts.sum()

    gif = sw.summ_gif("raw", (rng.rand(S, H, W, 3) * 255).astype(np.uint8))
    assert gif.dtype == np.uint8
    assert os.path.exists(os.path.join(str(tmp_path), "media", "00000000_raw.gif"))


def test_frame_id_stamping(tmp_path, rng):
    """frame_id/frame_ids stamp values onto vis output (reference
    utils/improc.py:294-314 draw_frame_id_on_vis; every eval script stamps
    the ATE via summ_traj2ds_on_rgb(frame_id=...))."""
    from pips_tpu.utils.improc import draw_frame_id_on_vis, strnum

    # strnum: reference utils/basic.py:14-19 formatting
    assert strnum(3) == "3"
    assert strnum(4.57) == "4.57"
    assert strnum(0.25) == ".25"
    assert strnum(-0.25) == "-.25"  # sign preserved (divergence from ref)
    assert strnum(-3.2) == "-3.2"

    img = np.zeros((40, 80, 3), np.uint8)
    stamped = draw_frame_id_on_vis(img, 6.03)
    assert stamped.shape == img.shape
    assert stamped.sum() > 0           # white text appeared
    assert img.sum() == 0              # input untouched (copy semantics)

    writer = MetricWriter(str(tmp_path), use_tensorboard=False)
    sw = Summ_writer(writer, global_step=0, log_freq=1)
    S, N, H, W = 4, 3, 40, 64
    rgbs = np.zeros((S, H, W, 3), np.uint8)
    trajs = (rng.rand(S, N, 2) * [W - 4, H - 4] + 2).astype(np.float32)
    vis = np.ones((S, N), np.float32)

    plain = sw.summ_traj2ds_on_rgb("a", trajs, rgbs[0], only_return=True)
    tagged = sw.summ_traj2ds_on_rgb("b", trajs, rgbs[0], only_return=True,
                                    frame_id=12.5)
    assert tagged.sum() > plain.sum()  # stamp added pixels

    seq = sw.summ_traj2ds_on_rgbs2("c", trajs, vis, rgbs, only_return=True,
                                   frame_ids=list(range(S)))
    seq0 = sw.summ_traj2ds_on_rgbs2("d", trajs, vis, rgbs, only_return=True)
    assert seq.sum() > seq0.sum()

    gif = sw.summ_rgbs("e", list(rgbs), only_return=True,
                       frame_ids=list(range(S)))
    assert gif.sum() > 0
    ods = sw.summ_oneds("f", [rng.rand(H, W) for _ in range(S)],
                        only_return=True, frame_ids=list(range(S)))
    assert ods.shape == (S, H, W, 3)
