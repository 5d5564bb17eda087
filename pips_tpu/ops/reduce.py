"""Masked reductions and normalization (parity: reference ``utils/basic.py``)."""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6


def reduce_masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None, keepdims: bool = False):
    """Mean of ``x`` where ``mask`` is nonzero: sum(x*mask)/(EPS+sum(mask)).

    Parity with reference ``utils/basic.py:59-76`` (same EPS placement).
    """
    prod = x * mask
    numer = jnp.sum(prod, axis=axis, keepdims=keepdims)
    denom = EPS + jnp.sum(mask, axis=axis, keepdims=keepdims)
    return numer / denom


def normalize_single(d: jnp.ndarray) -> jnp.ndarray:
    dmin = jnp.min(d)
    dmax = jnp.max(d)
    return (d - dmin) / (EPS + (dmax - dmin))


def normalize(d: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize each batch element independently (``utils/basic.py:49-57``)."""
    B = d.shape[0]
    flat = d.reshape(B, -1)
    dmin = jnp.min(flat, axis=1)
    dmax = jnp.max(flat, axis=1)
    shape = (B,) + (1,) * (d.ndim - 1)
    return (d - dmin.reshape(shape)) / (EPS + (dmax - dmin).reshape(shape))
