"""Farthest point sampling (capability parity: reference ``utils/misc.py:147-199``)."""

from __future__ import annotations

import numpy as np


def farthest_point_sample_py(xyz: np.ndarray, npoint: int,
                             rng: np.random.RandomState | None = None) -> np.ndarray:
    """xyz: (N, C) -> (npoint,) indices, numpy host-side variant."""
    rng = rng or np.random
    N, C = xyz.shape
    inds = np.zeros(npoint, np.int32)
    distance = np.full(N, 1e10)
    farthest = int(rng.randint(0, N))
    for i in range(npoint):
        inds[i] = farthest
        dist = ((xyz - xyz[farthest]) ** 2).sum(-1)
        mask = dist < distance
        distance[mask] = dist[mask]
        farthest = int(np.argmax(distance))
        if npoint > N:
            distance += rng.randn(*distance.shape)
    return inds


def farthest_point_sample(xyz, npoint: int, deterministic: bool = False,
                          include_ends: bool = False, seed: int = 0):
    """Batched jax variant. xyz: (B, N, C) -> (B, npoint) int32 indices.

    Device-friendly: a static python loop of ``npoint`` masked argmax updates
    (npoint is small in practice; each step is a vectorized reduction).
    ``include_ends`` pins samples 0/1 to the first/last input points
    (reference ``utils/misc.py:166-170``).
    """
    import jax.numpy as jnp

    B, N, C = xyz.shape
    if deterministic:
        farthest = jnp.zeros((B,), jnp.int32)
    else:
        rng = np.random.RandomState(seed)
        farthest = jnp.asarray(rng.randint(0, N, size=(B,)), jnp.int32)
    distance = jnp.full((B, N), 1e10, xyz.dtype)
    out = []
    batch = jnp.arange(B)
    for i in range(npoint):
        if include_ends and i == 0:
            farthest = jnp.zeros((B,), jnp.int32)
        elif include_ends and i == 1:
            farthest = jnp.full((B,), N - 1, jnp.int32)
        out.append(farthest)
        centroid = xyz[batch, farthest][:, None, :]  # (B, 1, C)
        dist = jnp.sum((xyz - centroid) ** 2, -1)
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, -1).astype(jnp.int32)
    return jnp.stack(out, axis=1)
