"""Dataset-generation pipeline tests on synthetic flow fields."""

import numpy as np

from pips_tpu.datagen import chain_flow_trajs, filter_trajs
from pips_tpu.datagen.occluders import consider_id, extract_occluders_for_clip


def make_translating_scene(S=4, H=48, W=64, vel=(2.0, 1.0), box=(10, 10, 34, 34)):
    """A square object (id 1) translating at constant velocity on bg (id 0)."""
    vx, vy = vel
    masks = np.zeros((S, H, W), np.float32)
    for s in range(S):
        x0, y0, x1, y1 = box
        ox, oy = int(round(vx * s)), int(round(vy * s))
        masks[s, y0 + oy:y1 + oy, x0 + ox:x1 + ox] = 1
    flows_f = np.zeros((S - 1, H, W, 2), np.float32)
    flows_b = np.zeros((S - 1, H, W, 2), np.float32)
    for s in range(S - 1):
        obj = masks[s] > 0
        flows_f[s][obj] = [vx, vy]
        flows_b[s][masks[s + 1] > 0] = [-vx, -vy]
    return masks, flows_f, flows_b


def test_chain_flow_trajs_tracks_translation():
    masks, ff, fb = make_translating_scene()
    trajs = chain_flow_trajs(ff)  # (S, H*W, 2)
    S, N, _ = trajs.shape
    H, W = masks.shape[1:]
    # a pixel inside the object moves with it
    px = 20 * W + 20  # (y=20, x=20) inside the box
    np.testing.assert_allclose(trajs[1, px] - trajs[0, px], [2.0, 1.0], atol=1e-5)
    # a background pixel far from the object stays put
    bg = 2 * W + 2
    np.testing.assert_allclose(trajs[-1, bg], trajs[0, bg], atol=1e-5)


def test_filter_trajs_keeps_consistent_only():
    masks, ff, fb = make_translating_scene()
    trajs = chain_flow_trajs(ff)
    kept = filter_trajs(trajs, masks, ff, fb)
    assert kept.shape[1] > 0
    # all kept trajectories are flow-consistent: recheck fb residual
    S = trajs.shape[0]
    H, W = masks.shape[1:]
    for s in range(S - 1):
        xi = np.clip(np.round(kept[s, :, 0]).astype(int), 0, W - 1)
        yi = np.clip(np.round(kept[s, :, 1]).astype(int), 0, H - 1)
        f = ff[s, yi, xi]
        xi2 = np.clip(np.round(kept[s + 1, :, 0]).astype(int), 0, W - 1)
        yi2 = np.clip(np.round(kept[s + 1, :, 1]).astype(int), 0, H - 1)
        b = fb[s, yi2, xi2]
        assert (np.linalg.norm(f + b, axis=1) < 0.5).all()


def test_consider_id_accepts_convex_moving_object():
    masks, ff, fb = make_translating_scene(H=96, W=128, box=(10, 10, 60, 60))
    trajs = consider_id(1.0, masks, ff, fb)
    assert trajs is not None
    assert trajs.shape[1] > 0
    # background id is rejected (not convex after subtracting the box? actually
    # bg IS its own id; it fails convexity because the object punches a hole)
    bg = consider_id(0.0, masks, ff, fb)
    assert bg is None


def test_extract_occluders_dict():
    masks, ff, fb = make_translating_scene(H=96, W=128, box=(10, 10, 60, 60))
    d = extract_occluders_for_clip(masks, ff, fb)
    assert "1" in d
    assert "0" not in d
