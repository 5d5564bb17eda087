"""Micro-bench: 12 fused channel-FF blocks fwd at inference scale (R=2048)
vs the plain-XLA reference, across row-tile sizes / grid semantics.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

import pips_tpu.kernels.mixer_pallas as mp

R, D, F = 2048, 512, 2048
DEPTH = 12
rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.randn(R, D), jnp.bfloat16)
Ws = [
    (jnp.asarray(1 + 0.1 * rng.randn(D), jnp.float32),
     jnp.asarray(0.1 * rng.randn(D), jnp.float32),
     jnp.asarray(rng.randn(D, F) * 0.03, jnp.float32),
     jnp.asarray(0.1 * rng.randn(F), jnp.float32),
     jnp.asarray(rng.randn(F, D) * 0.03, jnp.float32),
     jnp.asarray(0.1 * rng.randn(D), jnp.float32))
    for _ in range(DEPTH)
]


def stack(fn):
    def run(x, eps):
        x = x + eps.astype(x.dtype)
        for w in Ws:
            x = fn(x, *w)
        return jnp.sum(x.astype(jnp.float32))
    return run


@functools.partial(jax.jit, static_argnames=("which", "n"))
def chain(x, eps, which, n):
    fn = {"kernel": mp.chan_ff_block, "ref": mp.chan_ff_reference}[which]
    run = stack(fn)
    def body(carry, _):
        return run(x, carry * 1e-9 + eps), None
    v, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
    return v


def timeit(which, reps=16):
    float(jax.device_get(chain(x0, jnp.float32(0.0), which, 1)))
    float(jax.device_get(chain(x0, jnp.float32(0.0), which, reps + 1)))
    def best(n):
        b = float("inf")
        for k in range(3):
            t0 = time.time()
            float(jax.device_get(chain(x0, jnp.float32(1e-6 * (k + 1)), which, n)))
            b = min(b, time.time() - t0)
        return b
    dt = (best(reps + 1) - best(1)) / reps
    print(f"{which} tile={mp._row_tile(R)}: {dt * 1e6:.0f} us / 12-block stack",
          flush=True)
    return dt


timeit("ref")
timeit("kernel")

# variant: larger fwd tiles
orig = mp._row_tile
for cap in (512, 1024, 2048):
    mp._row_tile = lambda R_, c=cap: c if R_ % c == 0 else orig(R_)
    chain.clear_cache()
    try:
        timeit("kernel")
    except Exception as e:  # noqa: BLE001
        print(f"tile={cap}: FAIL {type(e).__name__} {str(e)[:160]}", flush=True)
mp._row_tile = orig
