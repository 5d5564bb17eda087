"""Bilinear point sampling.

Two distinct semantics coexist in the reference and both must be preserved:

* ``grid_sample_zeros`` — torch ``F.grid_sample(..., align_corners=True)``
  with zero padding, as used by ``nets/pips.py:313-328`` (``bilinear_sampler``)
  for corr-patch lookup: out-of-bounds corner taps contribute zero.
* ``bilinear_sample2d`` — reference ``utils/samp.py:5-78``: corner indices are
  clamped to the border but the weights come from the *unclamped* coords,
  which gives border-replication behavior. Used for ffeat init
  (``nets/pips.py:463``).

All images are channel-last: (B, H, W, C). Coordinates are xy pixel coords.

TPU note: the inner gather is expressed as ``jnp.take`` over a flattened
(H*W) axis with precomputed flat indices — XLA lowers this to an efficient
dynamic-gather; the 4 corner taps are batched into one gather of shape
(..., 4) to minimize HBM round-trips.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_hw(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """img: (B, H, W, C); iy/ix: (B, ...) int32 in-range. Returns (B, ..., C)."""
    B, H, W, C = img.shape
    flat = img.reshape(B, H * W, C)
    idx = iy * W + ix  # (B, ...)
    idx_2d = idx.reshape(B, -1)
    out = jnp.take_along_axis(flat, idx_2d[..., None], axis=1)  # (B, P, C)
    return out.reshape(*idx.shape, C)


def grid_sample_zeros(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with zero padding, align_corners=True pixel coords.

    img: (B, H, W, C); x, y: (B, ...) float pixel coords.
    Returns (B, ..., C). Matches torch ``F.grid_sample`` with
    ``padding_mode='zeros', align_corners=True`` when the grid is built as
    ``2*x/(W-1)-1`` (reference ``nets/pips.py:313-322``).
    """
    B, H, W, C = img.shape
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    wx = x - x0f
    wy = y - y0f

    def tap(iy, ix):
        valid = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1))
        iyc = jnp.clip(iy, 0, H - 1)
        ixc = jnp.clip(ix, 0, W - 1)
        v = _gather_hw(img, iyc, ixc)
        return v * valid[..., None].astype(img.dtype)

    w00 = ((1.0 - wx) * (1.0 - wy))[..., None]
    w01 = (wx * (1.0 - wy))[..., None]
    w10 = ((1.0 - wx) * wy)[..., None]
    w11 = (wx * wy)[..., None]

    return (tap(y0, x0) * w00 + tap(y0, x1) * w01
            + tap(y1, x0) * w10 + tap(y1, x1) * w11)


def bilinear_sample2d(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                      return_inbounds: bool = False):
    """Border-replicating bilinear point sample (reference ``utils/samp.py:5-78``).

    img: (B, H, W, C); x, y: (B, N). Returns (B, N, C) — note channel-last,
    unlike the reference's (B, C, N).

    Semantics: corner indices clamped to [0, size-1], weights from unclamped
    floor/ceil — so out-of-bounds queries replicate the border pixel.
    """
    B, H, W, C = img.shape
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y1, 0, H - 1)

    i00 = _gather_hw(img, y0c, x0c)
    i01 = _gather_hw(img, y0c, x1c)
    i10 = _gather_hw(img, y1c, x0c)
    i11 = _gather_hw(img, y1c, x1c)

    x1f = x0f + 1.0
    y1f = y0f + 1.0
    w00 = ((x1f - x) * (y1f - y))[..., None]
    w01 = ((x - x0f) * (y1f - y))[..., None]
    w10 = ((x1f - x) * (y - y0f))[..., None]
    w11 = ((x - x0f) * (y - y0f))[..., None]

    out = w00 * i00 + w01 * i01 + w10 * i10 + w11 * i11

    if return_inbounds:
        x_valid = (x > -0.5) & (x < W - 0.5)
        y_valid = (y > -0.5) & (y < H - 0.5)
        inbounds = (x_valid & y_valid).astype(jnp.float32)
        return out, inbounds
    return out
