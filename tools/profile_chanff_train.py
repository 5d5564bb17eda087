"""Micro-bench: 12-block channel-FF stack fwd+bwd (train shape R=1024 and
inference shape R=2048), Pallas kernel vs plain XLA.

Context (r4): the fwd-only micro (profile_chanff_micro.py) showed plain XLA
BEATING the fwd kernel at R=2048 (685 vs 993 us) — XLA reaches ~150 TF/s on
the fwd stack by pipelining gelu/LN VPU work against the matmuls, while the
monolithic kernel serializes them. This tool answers whether the kernel still
earns its keep on the training path (where it saves 4 intermediate HBM
round-trips per block in the backward).
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import pips_tpu.kernels.mixer_pallas as mp

D, F = 512, 2048
DEPTH = 12
rng = np.random.RandomState(0)


def make_ws():
    return [
        (jnp.asarray(1 + 0.1 * rng.randn(D), jnp.float32),
         jnp.asarray(0.1 * rng.randn(D), jnp.float32),
         jnp.asarray(rng.randn(D, F) * 0.03, jnp.float32),
         jnp.asarray(0.1 * rng.randn(F), jnp.float32),
         jnp.asarray(rng.randn(F, D) * 0.03, jnp.float32),
         jnp.asarray(0.1 * rng.randn(D), jnp.float32))
        for _ in range(DEPTH)
    ]


WS = make_ws()


def loss_fn(which):
    fn = {"kernel": mp.chan_ff_block, "ref": mp.chan_ff_reference}[which]

    def loss(ws, x):
        for w in ws:
            x = fn(x, *w)
        return jnp.sum(x.astype(jnp.float32))

    return loss


@functools.partial(jax.jit, static_argnames=("which", "n", "bwd"))
def chain(ws, x, eps, which, n, bwd):
    f = loss_fn(which)

    def one(carry):
        xi = x + (carry * 1e-9 + eps).astype(x.dtype)
        if not bwd:
            return f(ws, xi)
        v, grads = jax.value_and_grad(f)(ws, xi)
        # fold every grad leaf into the carry so nothing is dead
        acc = v
        for g in jax.tree_util.tree_leaves(grads):
            acc = acc + jnp.sum(g).astype(jnp.float32) * 1e-12
        return acc

    def body(carry, _):
        return one(carry), None

    v, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
    return v


def timeit(which, R, bwd, reps=8):
    x0 = jnp.asarray(rng.randn(R, D), jnp.bfloat16)
    float(jax.device_get(chain(WS, x0, jnp.float32(0.0), which, 1, bwd)))
    float(jax.device_get(chain(WS, x0, jnp.float32(0.0), which, reps + 1, bwd)))

    def best(n):
        b = float("inf")
        for k in range(3):
            t0 = time.time()
            float(jax.device_get(
                chain(WS, x0, jnp.float32(1e-6 * (k + 1)), which, n, bwd)))
            b = min(b, time.time() - t0)
        return b

    dt = (best(reps + 1) - best(1)) / reps
    tag = "fwd+bwd" if bwd else "fwd"
    # fwd flops: 12 * 2 matmuls; bwd adds 5 more matmuls per block
    nmm = 12 * (7 if bwd else 2)
    fl = nmm * 2 * R * D * F
    print(f"{which:6s} R={R} {tag:7s}: {dt * 1e6:7.0f} us"
          f"  ({fl / dt / 1e12:5.1f} TF/s)", flush=True)
    return dt


if __name__ == "__main__":
    for R in (1024, 2048):
        for which in ("ref", "kernel"):
            for bwd in (False, True):
                timeit(which, R, bwd)
