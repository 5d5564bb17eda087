"""Unit tests for pips_tpu.ops against torch golden behavior."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pips_tpu import ops
from pips_tpu.ops.corr import (build_fmap_pyramid, corr_pyramid, fcp_score_maps,
                               fused_corr_sample, sample_corr_pyramid)


def test_meshgrid2d():
    gy, gx = ops.meshgrid2d(2, 3, 4)
    assert gy.shape == (2, 3, 4)
    np.testing.assert_allclose(np.asarray(gy[0, :, 0]), [0, 1, 2])
    np.testing.assert_allclose(np.asarray(gx[1, 0, :]), [0, 1, 2, 3])
    stacked = ops.meshgrid2d(1, 2, 2, stack=True)
    # xy order
    np.testing.assert_allclose(np.asarray(stacked[0, 1, 0]), [0, 1])


def test_gridcloud2d():
    xy = ops.gridcloud2d(1, 2, 3)
    assert xy.shape == (1, 6, 2)
    # row-major over (y, x), xy order
    np.testing.assert_allclose(np.asarray(xy[0]), [[0, 0], [1, 0], [2, 0], [0, 1], [1, 1], [2, 1]])


def test_get_3d_embedding_matches_torch_formula(rng):
    B, N, C = 2, 5, 64
    xyz = rng.randn(B, N, 3).astype(np.float32) * 3
    got = np.asarray(ops.get_3d_embedding(jnp.asarray(xyz), C, cat_coords=True))

    # torch-side oracle mirroring reference utils/misc.py:44-69
    t = torch.from_numpy(xyz)
    x, y, z = t[:, :, 0:1], t[:, :, 1:2], t[:, :, 2:3]
    div_term = (torch.arange(0, C, 2, dtype=torch.float32) * (1000.0 / C)).reshape(1, 1, C // 2)
    pes = []
    for v in (x, y, z):
        pe = torch.zeros(B, N, C)
        pe[:, :, 0::2] = torch.sin(v * div_term)
        pe[:, :, 1::2] = torch.cos(v * div_term)
        pes.append(pe)
    want = torch.cat(pes + [t], dim=2).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_posemb_sincos_3d(rng):
    B, N = 2, 4
    xyz = rng.randn(B, N, 3).astype(np.float32)
    got = np.asarray(ops.posemb_sincos_3d(jnp.asarray(xyz), dim=8, cat_coords=True))
    assert got.shape == (B, N, 27)
    omega = 1.0 / (10000 ** (np.arange(4) / 3.0))
    want_x_sin = np.sin(xyz[:, :, 0:1] * omega[None, None])
    np.testing.assert_allclose(got[:, :, 0:4], want_x_sin, rtol=1e-5, atol=1e-5)


def test_reduce_masked_mean(rng):
    x = rng.randn(3, 4, 5).astype(np.float32)
    m = (rng.rand(3, 4, 5) > 0.5).astype(np.float32)
    got = float(ops.reduce_masked_mean(jnp.asarray(x), jnp.asarray(m)))
    want = (x * m).sum() / (1e-6 + m.sum())
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # axis variant
    got2 = np.asarray(ops.reduce_masked_mean(jnp.asarray(x), jnp.asarray(m), axis=2))
    want2 = (x * m).sum(2) / (1e-6 + m.sum(2))
    np.testing.assert_allclose(got2, want2, rtol=1e-5)


def test_normalize(rng):
    x = rng.randn(2, 3, 4).astype(np.float32)
    got = np.asarray(ops.normalize(jnp.asarray(x)))
    for b in range(2):
        want = (x[b] - x[b].min()) / (1e-6 + x[b].max() - x[b].min())
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-5)


def _torch_grid_sample_pix(img_nchw, x, y, padding_mode="zeros"):
    """torch grid_sample with pixel coords via the reference normalization."""
    H, W = img_nchw.shape[-2:]
    xg = 2 * x / (W - 1) - 1
    yg = 2 * y / (H - 1) - 1
    grid = torch.stack([xg, yg], dim=-1)  # (B, ..., 2)
    if grid.dim() == 3:  # (B, N, 2) -> (B, N, 1, 2)
        grid = grid.unsqueeze(2)
        out = F.grid_sample(img_nchw, grid, align_corners=True, padding_mode=padding_mode)
        return out.squeeze(3)  # B, C, N
    return F.grid_sample(img_nchw, grid, align_corners=True, padding_mode=padding_mode)


def test_grid_sample_zeros_matches_torch(rng):
    B, H, W, C = 2, 7, 9, 3
    img = rng.randn(B, H, W, C).astype(np.float32)
    N = 50
    # include far OOB, near-boundary, and exact-integer coords
    x = np.concatenate([rng.uniform(-3, W + 2, (B, N - 4)),
                        np.array([[0.0, W - 1.0, -0.5, W - 0.5]] * B)], axis=1).astype(np.float32)
    y = np.concatenate([rng.uniform(-3, H + 2, (B, N - 4)),
                        np.array([[0.0, H - 1.0, -0.5, H - 0.5]] * B)], axis=1).astype(np.float32)

    got = np.asarray(ops.grid_sample_zeros(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y)))

    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    want = _torch_grid_sample_pix(timg, torch.from_numpy(x), torch.from_numpy(y))
    want = want.permute(0, 2, 1).numpy()  # B, N, C
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bilinear_sample2d_interior_matches_grid_sample(rng):
    B, H, W, C = 2, 8, 10, 4
    img = rng.randn(B, H, W, C).astype(np.float32)
    N = 30
    x = rng.uniform(0.5, W - 1.5, (B, N)).astype(np.float32)
    y = rng.uniform(0.5, H - 1.5, (B, N)).astype(np.float32)
    got = np.asarray(ops.bilinear_sample2d(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y)))
    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    want = _torch_grid_sample_pix(timg, torch.from_numpy(x), torch.from_numpy(y))
    want = want.permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bilinear_sample2d_border_replicates(rng):
    B, H, W, C = 1, 5, 6, 2
    img = rng.randn(B, H, W, C).astype(np.float32)
    # far out of bounds -> replicate corner pixel
    x = np.array([[-5.0, W + 4.0]], dtype=np.float32)
    y = np.array([[-5.0, H + 4.0]], dtype=np.float32)
    got = np.asarray(ops.bilinear_sample2d(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got[0, 0], img[0, 0, 0], rtol=1e-5)
    np.testing.assert_allclose(got[0, 1], img[0, -1, -1], rtol=1e-5)


def test_bilinear_sample2d_inbounds_flag(rng):
    img = jnp.zeros((1, 4, 4, 1))
    x = jnp.asarray([[-0.6, 0.0, 3.4, 3.6]])
    y = jnp.asarray([[1.0, 1.0, 1.0, 1.0]])
    _, inb = ops.bilinear_sample2d(img, x, y, return_inbounds=True)
    np.testing.assert_allclose(np.asarray(inb[0]), [0, 1, 1, 0])


def test_resize_bilinear_align_corners_matches_torch(rng):
    for (hi, wi, ho, wo) in [(5, 7, 10, 14), (12, 16, 5, 9), (6, 6, 6, 6), (3, 4, 11, 3)]:
        img = rng.randn(2, hi, wi, 3).astype(np.float32)
        got = np.asarray(ops.resize_bilinear_align_corners(jnp.asarray(img), (ho, wo)))
        timg = torch.from_numpy(img).permute(0, 3, 1, 2)
        want = F.interpolate(timg, (ho, wo), mode="bilinear", align_corners=True)
        want = want.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_avg_pool2x2_matches_torch(rng):
    for (h, w) in [(8, 8), (7, 9), (5, 4)]:
        img = rng.randn(2, h, w, 3).astype(np.float32)
        got = np.asarray(ops.avg_pool2x2(jnp.asarray(img)))
        timg = torch.from_numpy(img).permute(0, 3, 1, 2)
        want = F.avg_pool2d(timg, 2, stride=2).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestCorr:
    """Corr pyramid vs a straightforward torch oracle of the same math."""

    def _setup(self, rng, B=1, S=2, N=5, C=16, H=16, W=24, L=3):
        fmaps = rng.randn(B, S, H, W, C).astype(np.float32)
        targets = rng.randn(B, S, N, C).astype(np.float32)
        coords = np.stack([rng.uniform(0, W - 1, (B, S, N)),
                           rng.uniform(0, H - 1, (B, S, N))], axis=-1).astype(np.float32)
        return fmaps, targets, coords

    def _torch_corr_levels(self, fmaps, targets, L):
        B, S, H, W, C = fmaps.shape
        fm = torch.from_numpy(fmaps).permute(0, 1, 4, 2, 3)  # B,S,C,H,W
        tg = torch.from_numpy(targets)
        levels = []
        for lvl in range(L):
            _, _, _, h, w = fm.shape
            fm2 = fm.reshape(B, S, C, h * w)
            corr = torch.matmul(tg, fm2).reshape(B, S, -1, h, w) / np.sqrt(C)
            levels.append(corr)
            fm = F.avg_pool2d(fm.reshape(B * S, C, h, w), 2, stride=2)
            fm = fm.reshape(B, S, C, h // 2, w // 2)
        return levels

    def test_corr_pyramid_matches(self, rng):
        fmaps, targets, coords = self._setup(rng)
        L = 3
        pyr = build_fmap_pyramid(jnp.asarray(fmaps), L)
        corrs = corr_pyramid(pyr, jnp.asarray(targets))
        want_levels = self._torch_corr_levels(fmaps, targets, L)
        for got, want in zip(corrs, want_levels):
            np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-4)

    def test_sample_matches_torch_grid_sample(self, rng):
        fmaps, targets, coords = self._setup(rng)
        L, r = 3, 2
        pyr = build_fmap_pyramid(jnp.asarray(fmaps), L)
        corrs = corr_pyramid(pyr, jnp.asarray(targets))
        got = np.asarray(sample_corr_pyramid(corrs, jnp.asarray(coords), radius=r))

        # torch oracle with the reference's transposed (dy,dx)->(x,y) ordering
        want_levels = self._torch_corr_levels(fmaps, targets, L)
        B, S, N, _ = coords.shape
        P = 2 * r + 1
        outs = []
        offs = torch.linspace(-r, r, P)
        delta = torch.stack(torch.meshgrid(offs, offs, indexing="ij"), dim=-1)  # (P,P,2)
        for lvl, corr in enumerate(want_levels):
            h, w = corr.shape[-2:]
            centroid = torch.from_numpy(coords).reshape(B * S * N, 1, 1, 2) / (2 ** lvl)
            coords_lvl = centroid + delta.view(1, P, P, 2)
            img = corr.reshape(B * S * N, 1, h, w)
            sampled = _torch_grid_sample_pix(img, coords_lvl[..., 0], coords_lvl[..., 1])
            outs.append(sampled.reshape(B, S, N, P * P))
        want = torch.cat(outs, dim=-1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_fused_matches_unfused(self, rng):
        fmaps, targets, coords = self._setup(rng, H=20, W=20)
        # push some coords near/over the border to exercise zero padding
        coords[..., 0] = coords[..., 0] * 1.3 - 3.0
        L, r = 3, 3
        pyr = build_fmap_pyramid(jnp.asarray(fmaps), L)
        corrs = corr_pyramid(pyr, jnp.asarray(targets))
        want = np.asarray(sample_corr_pyramid(corrs, jnp.asarray(coords), radius=r))
        got = np.asarray(fused_corr_sample(pyr, jnp.asarray(targets), jnp.asarray(coords), radius=r))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_fcp_score_maps(self, rng):
        fmaps, targets, _ = self._setup(rng)
        L = 3
        H8, W8 = fmaps.shape[2], fmaps.shape[3]
        pyr = build_fmap_pyramid(jnp.asarray(fmaps), L)
        corrs = corr_pyramid(pyr, jnp.asarray(targets))
        got = np.asarray(fcp_score_maps(corrs, (H8, W8)))
        want_levels = self._torch_corr_levels(fmaps, targets, L)
        B, S, N = want_levels[0].shape[:3]
        acc = torch.zeros(B, S, N, H8, W8)
        for corr in want_levels:
            h, w = corr.shape[-2:]
            up = F.interpolate(corr.reshape(B * S, N, h, w), (H8, W8),
                               mode="bilinear", align_corners=True)
            acc += up.reshape(B, S, N, H8, W8)
        np.testing.assert_allclose(got, acc.numpy(), rtol=1e-4, atol=1e-4)
