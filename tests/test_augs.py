"""Augmentation unit tests: fused color-jitter equivalence + replace/eraser
invariants (reference ``flyingthingsdataset.py:595-682``)."""

import numpy as np
import pytest

from pips_tpu.data import augs


def _unfused_jitter(rgb, rng, brightness=0.2, contrast=0.2, saturation=0.2):
    """The definitional three-pass brightness->contrast->saturation chain
    (torchvision ColorJitter order), as the oracle for the fused affine."""
    img = rgb.astype(np.float32)
    img = img * rng.uniform(1 - brightness, 1 + brightness)
    mean = img.mean()
    img = (img - mean) * rng.uniform(1 - contrast, 1 + contrast) + mean
    gray = img.mean(axis=2, keepdims=True)
    img = (img - gray) * rng.uniform(1 - saturation, 1 + saturation) + gray
    return np.clip(img, 0, 255).astype(np.uint8)


def test_color_jitter_matches_unfused_chain():
    img = (np.random.RandomState(3).rand(64, 96, 3) * 255).astype(np.uint8)
    for seed in range(5):
        got = augs.color_jitter(img, np.random.RandomState(seed), hue=0.0)
        want = _unfused_jitter(img, np.random.RandomState(seed))
        # fused path rounds (cv2.transform); the float chain truncates
        assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1
        assert got.dtype == np.uint8


def test_color_jitter_deterministic_and_identity_at_zero_strength():
    img = (np.random.RandomState(0).rand(32, 48, 3) * 255).astype(np.uint8)
    a = augs.color_jitter(img, np.random.RandomState(7))
    b = augs.color_jitter(img, np.random.RandomState(7))
    np.testing.assert_array_equal(a, b)
    ident = augs.color_jitter(img, np.random.RandomState(7), brightness=0.0,
                              contrast=0.0, saturation=0.0, hue=0.0)
    np.testing.assert_array_equal(ident, img)


def test_replace_aug_invariants():
    rng = np.random.RandomState(11)
    S, H, W, N = 4, 64, 96, 20
    rgbs = [(np.random.RandomState(s).rand(H, W, 3) * 255).astype(np.uint8)
            for s in range(S)]
    orig = [r.copy() for r in rgbs]
    trajs = (np.random.RandomState(1).rand(S, N, 2) * [W, H]).astype(np.float32)
    vis = np.ones((S, N), np.float32)
    out, trajs_o, vis_o = augs.replace_aug(rgbs, trajs, vis, rng, prob=1.0)
    assert all(o.dtype == np.uint8 and o.shape == (H, W, 3) for o in out)
    np.testing.assert_array_equal(out[0], orig[0])      # frame 0 untouched
    for s in range(S):                                  # inputs not mutated
        np.testing.assert_array_equal(rgbs[s], orig[s])
    assert any(not np.array_equal(out[s], orig[s]) for s in range(1, S))
    # occluded points were marked invisible, none were re-marked visible
    assert (vis_o <= vis).all()
    np.testing.assert_array_equal(trajs_o, trajs)


def test_eraser_aug_marks_covered_points_invisible():
    rng = np.random.RandomState(5)
    S, H, W = 3, 48, 64
    rgbs = [(np.random.RandomState(s).rand(H, W, 3) * 255).astype(np.uint8)
            for s in range(S)]
    trajs = np.tile(np.array([[10.0, 10.0]], np.float32), (S, 8, 1))
    trajs += np.random.RandomState(2).rand(S, 8, 2) * 30
    vis = np.ones((S, 8), np.float32)
    out, _, vis_o = augs.eraser_aug([r.copy() for r in rgbs], trajs, vis, rng,
                                    prob=1.0)
    assert (vis_o <= vis).all()
    changed = [not np.array_equal(o, r) for o, r in zip(out, rgbs)]
    assert not changed[0] and any(changed[1:])


def test_mark_in_rects_matches_float_compares():
    """Raster+floor-gather == the definitional per-rect float compares
    (x >= x0) & (x < x1) & (y >= y0) & (y < y1), incl. fractional points
    just inside/outside integer rect edges and negative coords."""
    rng = np.random.RandomState(9)
    H, W, N = 30, 40, 500
    xy = (rng.rand(N, 2) * [W + 10, H + 10] - 5).astype(np.float32)
    rects = []
    for _ in range(8):
        x0, y0 = rng.randint(0, W - 2), rng.randint(0, H - 2)
        rects.append((x0, x0 + rng.randint(1, W - x0),
                      y0, y0 + rng.randint(1, H - y0)))
    # edge probes around the first rect's bounds
    x0, x1, y0, y1 = rects[0]
    xy[:8] = [(x0 - 1e-3, y0 + 0.5), (x0, y0), (x1 - 1e-3, y1 - 1e-3),
              (x1, y0), (x0 + 0.5, y1), (-0.5, y0), (x0 + 0.1, y1 - 0.1),
              (x1 - 0.5, y0 + 0.5)]

    got = np.ones(N, np.float32)
    augs._mark_in_rects(xy, rects, got, (H, W))
    want = np.ones(N, np.float32)
    r = np.asarray(rects, np.float32)
    x, y = xy[:, 0], xy[:, 1]
    inside = ((x >= r[:, 0, None]) & (x < r[:, 1, None])
              & (y >= r[:, 2, None]) & (y < r[:, 3, None])).any(axis=0)
    want[inside] = 0
    np.testing.assert_array_equal(got, want)
    # hw=None derives the raster extent from the rects
    got2 = np.ones(N, np.float32)
    augs._mark_in_rects(xy, rects, got2)
    np.testing.assert_array_equal(got2, want)
    # float64 input forces the numpy raster fallback (native path is f32)
    got3 = np.ones(N, np.float64)
    augs._mark_in_rects(xy.astype(np.float64), rects, got3, (H, W))
    np.testing.assert_array_equal(got3.astype(np.float32), want)
