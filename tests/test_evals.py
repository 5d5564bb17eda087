"""Metric definition tests (vs hand-computed values and torch oracles)."""

import numpy as np
import torch

from pips_tpu.evals.metrics import ate_metrics, pck_at_sqrt_area, per_seq_vis_label
from pips_tpu.data.crohd import prep_sample


def test_per_seq_vis_label():
    vis = np.zeros((1, 8, 3), np.float32)
    vis[0, :4, 0] = 1   # visible in exactly 4 frames -> vis
    vis[0, :3, 1] = 1   # 3 frames -> occ
    vis[0, :, 2] = 1    # all -> vis
    lab = per_seq_vis_label(vis, 4)
    np.testing.assert_allclose(lab[0, 0], [1, 0, 1])
    assert (lab == lab[:, :1]).all()  # broadcast over S


def test_ate_metrics_matches_torch_formula(rng):
    B, S, N = 2, 4, 5
    e = rng.randn(B, S, N, 2).astype(np.float32) * 10
    g = rng.randn(B, S, N, 2).astype(np.float32) * 10
    valids = (rng.rand(B, S, N) > 0.2).astype(np.float32)
    vis = (rng.rand(B, S, N) > 0.5).astype(np.float32)
    m = ate_metrics(e, g, valids, vis)
    ate = torch.norm(torch.from_numpy(e - g), dim=-1)

    def rmm(mask):
        mask = torch.from_numpy(mask)
        return float((ate * mask).sum() / (1e-6 + mask.sum()))

    np.testing.assert_allclose(m["ate_all"], rmm(valids), rtol=1e-5)
    np.testing.assert_allclose(m["ate_vis"], rmm(valids * vis), rtol=1e-5)
    np.testing.assert_allclose(m["ate_occ"], rmm(valids * (1 - vis)), rtol=1e-5)


def test_pck_at_sqrt_area():
    S, N, H, W = 3, 2, 10, 10
    segs = np.zeros((S, H, W), np.float32)
    segs[:, :5, :5] = 1  # area 25 -> thr = 0.2*5 = 1.0
    g = np.zeros((S, N, 2), np.float32)
    e = g.copy()
    e[1, 0] = [0.5, 0.0]   # dist 0.5 < 1 -> correct
    e[1, 1] = [3.0, 0.0]   # dist 3 > 1 -> wrong
    e[2, 0] = [0.0, 0.9]   # correct
    e[2, 1] = [0.0, 1.5]   # wrong
    vis = np.ones((S, N), np.float32)
    pck = pck_at_sqrt_area(e, g, vis, segs)
    np.testing.assert_allclose(pck, 50.0)
    # frame 0 is excluded; invisible kps are excluded
    vis[1, 1] = 0
    vis[2, 1] = 0
    np.testing.assert_allclose(pck_at_sqrt_area(e, g, vis, segs), 100.0)


def test_crohd_prep_sample():
    S_raw, N = 24, 6
    rng = np.random.RandomState(0)
    xylist = np.cumsum(rng.rand(S_raw, N, 2) * 20, axis=0).astype(np.float64)
    scorelist = np.ones((S_raw, N))
    vislist = np.ones((S_raw, N))
    scorelist[5, 0] = -1        # head 0: missing a frame -> dropped
    vislist[6, 1] = 0           # head 1: occluded mid-seq
    vislist[0, 2] = 0           # head 2: not visible at start -> dropped
    xylist[:, 3] = 5.0          # head 3: static -> dropped
    sample = {"rgbs": np.zeros((S_raw, 8, 8, 3), np.float32),
              "xylist": xylist, "scorelist": scorelist, "vislist": vislist,
              "boxlist": np.zeros((S_raw, N, 4))}

    d_occ, ok = prep_sample(sample, N_max=16, S_stride=3, req_occlusion=True)
    assert ok
    assert d_occ["trajs_g"].shape == (1, 8, 1, 2)  # only head 1 (occluded)
    d_vis, ok = prep_sample(sample, N_max=16, S_stride=3, req_occlusion=False)
    assert ok
    # heads 4, 5 fully visible+moving+present (head 0 dropped: frame 5 not in
    # the strided set {0,3,6,...}? frame 5 is dropped by striding -> head 0 kept)
    assert d_vis["trajs_g"].shape[2] >= 2
