"""Sinusoidal positional embeddings.

``get_3d_embedding`` reproduces the reference's idiosyncratic scheme
(reference ``utils/misc.py:44-69``): frequencies ``arange(0, C, 2) * (1000/C)``
(NOT the standard transformer ``1/10000^(2i/d)``), with sin/cos interleaved on
the channel axis. This feeds the DeltaBlock's flow encoding, so exactness
matters for parity.
"""

from __future__ import annotations

import jax.numpy as jnp


def _interleave_sincos(v: jnp.ndarray, div_term: jnp.ndarray, C: int) -> jnp.ndarray:
    """v: (..., 1); returns (..., C) with sin at even idx, cos at odd idx."""
    angles = v * div_term  # (..., C//2)
    sin = jnp.sin(angles)
    cos = jnp.cos(angles)
    # interleave: out[..., 0::2] = sin, out[..., 1::2] = cos
    out = jnp.stack([sin, cos], axis=-1)  # (..., C//2, 2)
    return out.reshape(*v.shape[:-1], C)


def get_3d_embedding(xyz: jnp.ndarray, C: int, cat_coords: bool = True) -> jnp.ndarray:
    """xyz: (B, N, 3) -> (B, N, 3*C [+3]).

    Per-axis interleaved sin/cos with frequencies ``arange(0,C,2)*(1000/C)``
    (reference ``utils/misc.py:51``), concatenated [pe_x, pe_y, pe_z (, xyz)].
    """
    B, N, D = xyz.shape
    assert D == 3
    div_term = (jnp.arange(0, C, 2, dtype=jnp.float32) * (1000.0 / C)).reshape(1, 1, C // 2)
    pe_x = _interleave_sincos(xyz[:, :, 0:1], div_term, C)
    pe_y = _interleave_sincos(xyz[:, :, 1:2], div_term, C)
    pe_z = _interleave_sincos(xyz[:, :, 2:3], div_term, C)
    pe = jnp.concatenate([pe_x, pe_y, pe_z], axis=2)
    if cat_coords:
        pe = jnp.concatenate([pe, xyz], axis=2)
    return pe


def posemb_sincos_2d_xy(x: jnp.ndarray, y: jnp.ndarray, temperature: float = 10000.0,
                        dim: int = 64) -> jnp.ndarray:
    """x, y: (B, S) -> (B, S, dim). Block layout [sin(x), cos(x), sin(y), cos(y)].

    Parity with reference ``utils/misc.py:4-19``.
    """
    B, S = x.shape
    assert dim % 4 == 0
    omega = jnp.arange(dim // 4, dtype=jnp.float32) / (dim // 4 - 1)
    omega = 1.0 / (temperature ** omega)
    yw = y.reshape(-1)[:, None] * omega[None, :]
    xw = x.reshape(-1)[:, None] * omega[None, :]
    pe = jnp.concatenate([jnp.sin(xw), jnp.cos(xw), jnp.sin(yw), jnp.cos(yw)], axis=1)
    return pe.reshape(B, S, dim)


def posemb_sincos_3d(xyz: jnp.ndarray, temperature: float = 10000.0, dim: int = 64,
                     cat_coords: bool = False) -> jnp.ndarray:
    """xyz: (B, N, 3) -> (B, N, 3*dim [+3]). Block layout per axis [sin, cos].

    Parity with reference ``utils/misc.py:21-42``.
    """
    B, N, D = xyz.shape
    assert D == 3
    assert dim % 2 == 0
    omega = jnp.arange(dim // 2, dtype=jnp.float32) / (dim // 2 - 1)
    omega = 1.0 / (temperature ** omega)
    parts = []
    for i in range(3):
        w = xyz[:, :, i].reshape(-1)[:, None] * omega[None, :]
        parts.extend([jnp.sin(w), jnp.cos(w)])
    pe = jnp.concatenate(parts, axis=1).reshape(B, N, dim * 3)
    if cat_coords:
        pe = jnp.concatenate([pe, xyz], axis=2)
    return pe
