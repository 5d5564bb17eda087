"""DINO label-propagation tracking baseline.

Capability parity with the reference's DINO baseline (``utils/test.py:6-194``;
used by ``test_on_flt.py:245-248`` / ``test_on_badja.py`` with a torch.hub
ViT-S/8): per-frame ViT features; per target frame, masked affinity
(local 12-neighborhood, temperature 0.1, top-5 per query) against frame-1 +
the last-7-frame queue; propagated one-hot keypoint heatmaps; soft-argmax.

The ViT backbone is a standard flax ViT-S/8 with a converter for DINO torch
checkpoints (weights must be supplied; the reference downloads them from
torch.hub, which requires network access).
"""

from __future__ import annotations

import functools
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.228, 0.224, 0.225], np.float32)


class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(num_heads=self.heads, name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + y


class ViT(nn.Module):
    """ViT-S by default (dim 384, depth 12, heads 6), patch size 8."""
    patch_size: int = 8
    dim: int = 384
    depth: int = 12
    heads: int = 6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, 3) normalized. Returns patch tokens (B, h*w, dim)."""
        B, H, W, _ = x.shape
        h, w = H // self.patch_size, W // self.patch_size
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    name="patch_embed")(x)
        x = x.reshape(B, h * w, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + h * w, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), x], axis=1)
        x = x + pos
        for d in range(self.depth):
            x = ViTBlock(self.dim, self.heads, name=f"block{d}")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x[:, 1:]  # drop CLS


def neighborhood_mask(h: int, w: int, radius: int = 12) -> jnp.ndarray:
    """(h*w, h*w) 0/1 mask restricting sources to a local window
    (reference ``utils/test.py:49-64``)."""
    ii = jnp.arange(h)[:, None]
    jj = jnp.arange(w)[:, None]
    di = jnp.abs(ii - ii.T) <= radius  # (h, h)
    dj = jnp.abs(jj - jj.T) <= radius  # (w, w)
    mask = di[:, None, :, None] & dj[None, :, None, :]  # (h, w, h, w)
    return mask.reshape(h * w, h * w).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("h", "w", "topk"))
def label_propagation(feat_tar: jnp.ndarray, feat_sources: jnp.ndarray,
                      segs: jnp.ndarray, mask: jnp.ndarray, h: int, w: int,
                      topk: int = 5, temperature: float = 0.1) -> jnp.ndarray:
    """feat_tar: (h*w, C); feat_sources: (n, C, h*w); segs: (n, N, h, w).

    Returns propagated heatmaps (N, h, w). Parity with
    reference ``utils/test.py:66-101``.
    """
    n = feat_sources.shape[0]
    ft = feat_tar / (jnp.linalg.norm(feat_tar, axis=1, keepdims=True) + 1e-12)
    fs = feat_sources / (jnp.linalg.norm(feat_sources, axis=1, keepdims=True) + 1e-12)
    aff = jnp.exp(jnp.einsum("qc,ncs->nqs", ft, fs,
                             precision=jax.lax.Precision.HIGHEST) / temperature)
    aff = aff * mask[None]  # (n, q, s)
    # per query, top-5 over all n*h*w sources
    aff = jnp.swapaxes(aff, 1, 2).reshape(n * h * w, h * w)  # (sources, queries)
    kth = jnp.sort(aff, axis=0)[-topk]  # (queries,) k-th largest per query
    aff = jnp.where(aff < kth[None], 0.0, aff)
    aff = aff / jnp.sum(aff, axis=0, keepdims=True)
    N = segs.shape[1]
    segs_flat = jnp.swapaxes(segs, 0, 1).reshape(N, n * h * w)
    seg_tar = segs_flat @ aff  # (N, h*w)
    return seg_tar.reshape(N, h, w)


def soft_argmax_xy(heat: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) nonneg heatmaps -> (N, 2) xy weighted-average coords."""
    N, H, W = heat.shape
    total = heat.sum(axis=(1, 2))
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    cy = (heat.sum(2) @ ys) / (total + 1e-12)
    cx = (heat.sum(1) @ xs) / (total + 1e-12)
    return jnp.stack([cx, cy], axis=1)


def norm_heat(heat: jnp.ndarray) -> jnp.ndarray:
    """Per-channel min-max normalize where max>0 (``utils/test.py:103-111``)."""
    N = heat.shape[0]
    flat = heat.reshape(N, -1)
    mn = flat.min(axis=1).reshape(N, 1, 1)
    mx = flat.max(axis=1).reshape(N, 1, 1)
    normed = (heat - mn) / jnp.where(mx - mn > 0, mx - mn, 1.0)
    return jnp.where(mx > 0, normed, heat)


class DinoTracker:
    """Keypoint tracking via label propagation over ViT features
    (reference ``utils/test.py:114-194``)."""

    def __init__(self, feat_fn: Callable[[np.ndarray], np.ndarray],
                 patch_size: int = 8, n_last_frames: int = 7,
                 neighborhood: int = 12):
        """feat_fn: (S, H, W, 3) raw [0,255] frames -> (S, h, w, C) features."""
        self.feat_fn = feat_fn
        self.patch_size = patch_size
        self.n_last_frames = n_last_frames
        self.neighborhood = neighborhood

    @staticmethod
    def make_vit_feat_fn(variables, patch_size: int = 8, dim: int = 384,
                         depth: int = 12, heads: int = 6):
        model = ViT(patch_size=patch_size, dim=dim, depth=depth, heads=heads)

        @jax.jit
        def feat_fn(rgbs):
            x = rgbs / 255.0
            x = (x - IMAGENET_MEAN) / IMAGENET_STD
            S, H, W, _ = x.shape
            tokens = model.apply(variables, x)  # (S, h*w, C)
            h, w = H // patch_size, W // patch_size
            return tokens.reshape(S, h, w, -1)

        return feat_fn

    def track(self, rgbs: np.ndarray, xy0: np.ndarray,
              prev_fallback: bool = True) -> np.ndarray:
        """rgbs: (S, H, W, 3) [0,255]; xy0: (N, 2). Returns trajs (S, N, 2)."""
        S, H, W, _ = rgbs.shape
        N = xy0.shape[0]
        p = self.patch_size

        featmaps = np.asarray(self.feat_fn(jnp.asarray(rgbs, jnp.float32)))
        _, h, w, C = featmaps.shape
        feats = featmaps.reshape(S, h * w, C)

        first_seg = np.zeros((N, h, w), np.float32)
        for n in range(N):
            first_seg[n, int(xy0[n, 1] // p), int(xy0[n, 0] // p)] = 1

        mask = neighborhood_mask(h, w, self.neighborhood)

        trajs = np.zeros((S, N, 2), np.float32)
        trajs[0] = xy0
        queue: list[tuple[np.ndarray, np.ndarray]] = []
        frame1 = (feats[0], first_seg)
        for s in range(1, S):
            sources = [frame1] + queue
            feat_sources = jnp.asarray(
                np.stack([f.T.reshape(C, h * w) for f, _ in sources]))
            segs = jnp.asarray(np.stack([sg for _, sg in sources]))
            seg_tar = label_propagation(jnp.asarray(feats[s]), feat_sources,
                                        segs, mask, h, w)

            if len(queue) == self.n_last_frames:
                queue.pop(0)
            queue.append((feats[s], np.asarray(seg_tar)))

            # upsample to pixels (half-pixel bilinear), normalize, soft-argmax
            up = jax.image.resize(seg_tar, (N, h * p, w * p), method="linear")
            up = norm_heat(up)
            xy = np.array(soft_argmax_xy(up))
            if prev_fallback:
                empty = np.asarray(up.sum(axis=(1, 2))) <= 0
                xy[empty] = trajs[s - 1][empty]
            trajs[s] = xy
        return trajs
