"""Bisect the Mosaic compile failure of corr_sample_pallas on real TPU.

Run from repo root: python tools/debug_pallas.py
"""

import sys
import traceback

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from pips_tpu.kernels.corr_pallas import corr_sample_pallas_level  # noqa: E402


def try_case(S, H, W, C, N, TN, radius=3):
    rng = np.random.RandomState(0)
    fmap = jnp.asarray(rng.rand(S, H, W, C), jnp.float32)
    targets = jnp.asarray(rng.rand(S, N, C), jnp.float32)
    coords = jnp.asarray(
        np.stack([rng.uniform(0, W - 1, (S, N)), rng.uniform(0, H - 1, (S, N))], -1),
        jnp.float32)
    try:
        out = corr_sample_pallas_level(fmap, targets, coords, radius=radius,
                                       tile_n=TN)
        out.block_until_ready()
        print(f"OK   S={S} H={H} W={W} C={C} N={N} TN={TN} -> {out.shape}")
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:300]
        print(f"FAIL S={S} H={H} W={W} C={C} N={N} TN={TN}: {type(e).__name__}: {msg}")
        return False


if __name__ == "__main__":
    try_case(1, 8, 128, 128, 8, 8)       # tiny, aligned W
    try_case(1, 16, 128, 128, 128, 128)  # aligned, full tile
    try_case(1, 60, 128, 128, 128, 128)  # davis level0
    try_case(1, 30, 64, 128, 128, 128)   # davis level1 (W=64 lanes)
    try_case(1, 8, 16, 128, 128, 128)    # davis level3 (W=16)
    try_case(8, 60, 128, 128, 256, 128)  # full S grid
