"""DINO label-propagation baseline tests (algorithm-level, torch oracle)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pips_tpu.models.dino import (DinoTracker, label_propagation, neighborhood_mask,
                                  norm_heat, soft_argmax_xy)


def test_neighborhood_mask_matches_reference_loops():
    h, w, r = 6, 5, 2
    got = np.asarray(neighborhood_mask(h, w, r))
    want = np.zeros((h, w, h, w), np.float32)
    for i in range(h):
        for j in range(w):
            for p in range(2 * r + 1):
                for q in range(2 * r + 1):
                    ii, jj = i - r + p, j - r + q
                    if 0 <= ii < h and 0 <= jj < w:
                        want[i, j, ii, jj] = 1
    np.testing.assert_array_equal(got, want.reshape(h * w, h * w))


def test_label_propagation_matches_torch(rng):
    h, w, C, n, N = 6, 5, 16, 3, 4
    feat_tar = rng.randn(h * w, C).astype(np.float32)
    feat_sources = rng.randn(n, C, h * w).astype(np.float32)
    segs = (rng.rand(n, N, h, w) > 0.9).astype(np.float32)
    mask = neighborhood_mask(h, w, 2)

    got = np.asarray(label_propagation(jnp.asarray(feat_tar),
                                       jnp.asarray(feat_sources),
                                       jnp.asarray(segs), mask, h, w, topk=5))

    # torch oracle mirroring utils/test.py:66-101
    ft = F.normalize(torch.from_numpy(feat_tar), dim=1, p=2)
    fs = F.normalize(torch.from_numpy(feat_sources), dim=1, p=2)
    aff = torch.exp(torch.bmm(ft.unsqueeze(0).repeat(n, 1, 1), fs) / 0.1)
    aff = aff * torch.from_numpy(np.asarray(mask)).unsqueeze(0)
    aff = aff.transpose(2, 1).reshape(-1, h * w)
    tk_val, _ = torch.topk(aff, dim=0, k=5)
    tk_val_min, _ = torch.min(tk_val, dim=0)
    aff[aff < tk_val_min] = 0
    aff = aff / torch.sum(aff, keepdim=True, axis=0)
    segs_t = torch.from_numpy(segs).reshape(n, N, -1).transpose(2, 1).reshape(-1, N).T
    want = torch.mm(segs_t, aff).reshape(N, h, w).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)


def test_soft_argmax():
    heat = np.zeros((1, 8, 10), np.float32)
    heat[0, 3, 7] = 2.0
    xy = np.asarray(soft_argmax_xy(jnp.asarray(heat)))
    np.testing.assert_allclose(xy[0], [7, 3], atol=1e-5)


def test_norm_heat():
    heat = np.stack([np.zeros((4, 4), np.float32),
                     np.full((4, 4), 3.0, np.float32)])
    heat[1, 0, 0] = 1.0
    out = np.asarray(norm_heat(jnp.asarray(heat)))
    np.testing.assert_allclose(out[0], 0.0)
    assert out[1].max() == 1.0 and out[1].min() == 0.0


def test_dino_tracker_end_to_end_shapes(rng):
    # synthetic feature function: downsampled RGB as "features" — a moving
    # bright square should be trackable by appearance matching
    p = 8

    def feat_fn(rgbs):
        S, H, W, _ = rgbs.shape
        f = jnp.asarray(rgbs).reshape(S, H // p, p, W // p, p, 3).mean((2, 4))
        return f

    S, H, W = 5, 64, 80
    rgbs = np.zeros((S, H, W, 3), np.float32)
    for s in range(S):
        rgbs[s, 16:32, 16 + 8 * s:32 + 8 * s] = 255.0
    xy0 = np.array([[20.0, 20.0]], np.float32)

    tracker = DinoTracker(feat_fn, patch_size=p, neighborhood=12)
    trajs = tracker.track(rgbs, xy0)
    assert trajs.shape == (S, 1, 2)
    # the tracked point should move right with the square
    assert trajs[-1, 0, 0] > trajs[0, 0, 0] + 8
