"""Compare corr execution paths on the real chip with chained-dependency
timing (naive independent repeats overlap/cache on tunneled platforms).

Run from repo root: python tools/profile_corr_modes.py [--dense] [--small]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from pips_tpu.models import Pips  # noqa: E402


def chain_time(step_fn, carry0, reps=6):
    """(time(scan n=reps+1) - time(scan n=1)) / reps."""
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(c0, n):
        def body(c, _):
            return step_fn(c), None
        c, _ = jax.lax.scan(body, c0, None, length=n)
        return jax.tree.map(jnp.sum, c)

    def sync(n):
        return float(jax.device_get(jnp.sum(
            jnp.asarray(jax.tree.leaves(run(carry0, n))[0], jnp.float32))))

    sync(1)
    t0 = time.time()
    sync(1)
    t1 = time.time() - t0
    sync(reps + 1)  # compile n=reps+1
    t0 = time.time()
    sync(reps + 1)
    tn = time.time() - t0
    return max(tn - t1, 1e-9) / reps


def main():
    dense = "--dense" in sys.argv
    small = "--small" in sys.argv
    bf16 = "--bf16" in sys.argv
    model = Pips(S=8, stride=8, dtype=jnp.bfloat16 if bf16 else None)
    rng = np.random.RandomState(0)
    Hi, Wi = (360, 640) if small else (480, 1024)
    N = 7680 if dense else 256
    rgbs = jnp.asarray(rng.rand(1, 8, Hi, Wi, 3) * 255, jnp.float32)
    xys0 = jnp.asarray(rng.rand(1, N, 2) * [Wi - 8, Hi - 8] + 4, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), xys0[:, :8], rgbs[:, :, :64, :64],
                        iters=1)
    lims = jnp.asarray([Wi - 8.0, Hi - 8.0])

    # encoder: chain on rgbs
    def enc_step(r):
        fm = model.apply(params, r, method=Pips.encode)
        return r + jnp.mean(fm) * 1e-12

    t_enc = chain_time(enc_step, rgbs, reps=4)
    print(f"encode: {t_enc * 1e3:.2f} ms")

    fmaps = jax.jit(lambda p, r: model.apply(p, r, method=Pips.encode))(params, rgbs)

    for mode in ("full", "onehot", "pallas", "fused"):
        def track_step(xys, m=mode):
            out = model.apply(params, fmaps, xys, iters=6, is_train=False,
                              corr_mode=m, method=Pips.track)
            trajs = out.coord_predictions[-1]
            return jnp.clip(trajs[:, -1] * 0.99 + 1.0, 8.0, lims)

        try:
            t = chain_time(track_step, xys0, reps=4)
            print(f"corr_mode={mode:7s}: track {t * 1e3:.2f} ms ({N * 8 / t:.0f} pf/s)")
        except Exception as e:
            print(f"corr_mode={mode}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
