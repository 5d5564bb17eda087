"""Compare corr execution paths on the real chip (davis-style config).

Run from repo root: python tools/profile_corr_modes.py [--dense]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from pips_tpu.models import Pips  # noqa: E402


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    dense = "--dense" in sys.argv
    model = Pips(S=8, stride=8)
    rng = np.random.RandomState(0)
    Hi, Wi = 480, 1024
    N = 7680 if dense else 256
    rgbs = jnp.asarray(rng.rand(1, 8, Hi, Wi, 3) * 255, jnp.float32)
    xys = jnp.asarray(rng.rand(1, N, 2) * [Wi - 8, Hi - 8] + 4, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), xys[:, :8], rgbs[:, :, :64, :64],
                        iters=1)

    encode = jax.jit(lambda p, r: model.apply(p, r, method=Pips.encode))
    fmaps = encode(params, rgbs)
    print(f"encode: {timeit(encode, params, rgbs) * 1e3:.2f} ms")

    outs = {}
    for mode in ("full", "fused", "onehot", "pallas"):
        track = jax.jit(lambda p, f, x, m=mode: model.apply(
            p, f, x, iters=6, is_train=False, corr_mode=m,
            method=Pips.track).coord_predictions[-1])
        try:
            t = timeit(track, params, fmaps, xys, reps=5)
            outs[mode] = np.asarray(track(params, fmaps, xys))
            print(f"corr_mode={mode:7s}: track {t * 1e3:.2f} ms "
                  f"({N * 8 / t:.0f} pf/s)")
        except Exception as e:
            print(f"corr_mode={mode}: FAILED {type(e).__name__}: {str(e)[:300]}")
    ref = outs.get("full")
    for mode, v in outs.items():
        if ref is not None and mode != "full":
            print(f"  {mode} max|Δ| vs full: {np.abs(v - ref).max():.2e}")


if __name__ == "__main__":
    main()
