"""Coordinate-grid constructors.

Capability parity with reference ``utils/basic.py:95-126`` (``meshgrid2d``,
``gridcloud2d``) and ``nets/pips.py:330-333`` (``coords_grid``), in xy pixel
coordinates.
"""

from __future__ import annotations

import jax.numpy as jnp


def meshgrid2d(B: int, Y: int, X: int, stack: bool = False, dtype=jnp.float32):
    """Return (grid_y, grid_x), each (B, Y, X); or stacked (B, Y, X, 2) in xy order."""
    grid_y = jnp.broadcast_to(jnp.arange(Y, dtype=dtype)[None, :, None], (B, Y, X))
    grid_x = jnp.broadcast_to(jnp.arange(X, dtype=dtype)[None, None, :], (B, Y, X))
    if stack:
        return jnp.stack([grid_x, grid_y], axis=-1)
    return grid_y, grid_x


def gridcloud2d(B: int, Y: int, X: int, dtype=jnp.float32) -> jnp.ndarray:
    """All pixel centers as a point list: (B, Y*X, 2) in xy order, row-major over (y, x)."""
    grid_y, grid_x = meshgrid2d(B, Y, X, dtype=dtype)
    x = grid_x.reshape(B, -1)
    y = grid_y.reshape(B, -1)
    return jnp.stack([x, y], axis=2)


def coords_grid(batch: int, ht: int, wd: int, dtype=jnp.float32) -> jnp.ndarray:
    """Dense coordinate image (batch, ht, wd, 2) in xy order (channel-last)."""
    return meshgrid2d(batch, ht, wd, stack=True, dtype=dtype)
