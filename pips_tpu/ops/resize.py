"""Align-corners bilinear resize and 2x2 average pooling.

torch's ``F.interpolate(mode='bilinear', align_corners=True)`` has no direct
jax.image equivalent (jax uses half-pixel centers). The reference depends on
align-corners semantics in two hot spots: the encoder's multi-scale feature
fusion (``nets/pips.py:269-272``) and the train-time score-map upsampling
(``nets/pips.py:509``).

TPU-first design: for static shapes, a separable align-corners resize is two
small dense matmuls (out = A_y @ img @ A_x^T), which XLA places on the MXU —
far better than a gather-based formulation. The interpolation matrices are
built with numpy at trace time and baked into the program as constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) align-corners linear interpolation matrix."""
    A = np.zeros((n_out, n_in), dtype=np.float32)
    if n_out == 1:
        A[0, 0] = 1.0
        return A
    if n_in == 1:
        A[:, 0] = 1.0
        return A
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    j0 = np.floor(pos).astype(np.int64)
    j0 = np.clip(j0, 0, n_in - 2)
    w = pos - j0
    rows = np.arange(n_out)
    A[rows, j0] = (1.0 - w).astype(np.float32)
    A[rows, j0 + 1] = w.astype(np.float32)
    return A


def resize_bilinear_align_corners(img: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """img: (..., H, W, C) -> (..., H_out, W_out, C), align-corners bilinear."""
    H_out, W_out = out_hw
    H, W = img.shape[-3], img.shape[-2]
    if (H, W) == (H_out, W_out):
        return img
    Ay = jnp.asarray(_interp_matrix(H, H_out), img.dtype)  # (H_out, H)
    Ax = jnp.asarray(_interp_matrix(W, W_out), img.dtype)  # (W_out, W)
    # exact passes for f32 (parity); bf16 inputs run native MXU
    prec = (jax.lax.Precision.HIGHEST if img.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    out = jnp.einsum("oh,...hwc->...owc", Ay, img, precision=prec)
    out = jnp.einsum("pw,...hwc->...hpc", Ax, out, precision=prec)
    return out


def resize_bilinear_align_corners_s2d(x2: jnp.ndarray,
                                      out_hw: tuple[int, int]) -> jnp.ndarray:
    """``resize_bilinear_align_corners`` reading the W-s2d layout directly.

    x2: (..., H, W/2, 2C) — the W-only space-to-depth view of an
    (..., H, W, C) tensor (column pair 2p+a lives at channel a*C+c).
    Returns (..., H_out, W_out, C), numerically identical to resizing the
    un-s2d view (same H-then-W contraction order).

    Why: un-s2d'ing is a real relayout in the TPU's tiled layout (the
    (W/2, 2C) -> (W, C) reshape moves data between lane tiles). Contracting
    H *first*, while still packed, shrinks the tensor by H/H_out before the
    un-s2d reshape — at the encoder's stage-1 fusion resize (192 -> 48) the
    relayout touches 4x fewer bytes, and the downstream W contraction is a
    plain matmul either way.
    """
    H_out, W_out = out_hw
    H, P = x2.shape[-3], x2.shape[-2]
    C = x2.shape[-1] // 2
    W = 2 * P
    prec = (jax.lax.Precision.HIGHEST if x2.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    if H != H_out:
        Ay = jnp.asarray(_interp_matrix(H, H_out), x2.dtype)
        x2 = jnp.einsum("oh,...hpc->...opc", Ay, x2, precision=prec)
    t = x2.reshape(*x2.shape[:-2], W, C)
    if W == W_out:
        return t
    Ax = jnp.asarray(_interp_matrix(W, W_out), x2.dtype)
    return jnp.einsum("pw,...hwc->...hpc", Ax, t, precision=prec)


def avg_pool2x2(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 average pool, VALID padding (floor output size).

    Parity with torch ``F.avg_pool2d(x, 2, stride=2)`` used for the corr
    pyramid (reference ``nets/pips.py:349``). img: (..., H, W, C).
    """
    H, W, C = img.shape[-3], img.shape[-2], img.shape[-1]
    H2, W2 = H // 2, W // 2
    x = img[..., : H2 * 2, : W2 * 2, :]
    x = x.reshape(*img.shape[:-3], H2, 2, W2, 2, C)
    return x.mean(axis=(-4, -2))
