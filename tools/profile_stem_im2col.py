"""Micro-bench: bf16 stem W-s2d conv vs explicit-im2col matmul, grad wrt
WEIGHTS ONLY (the train situation: the stem is the first layer, so autodiff
never needs an input gradient).

Motivation (r3 trace, tools/parse_xplane.py on the 30.96 ms train step): the
stem's autodiff weight-grad conv runs at 8.5 TF/s (~1.03 ms/step) because
XLA's dgrad-w strategy has matmul M = C_in = 6 — six of 128 sublanes. The
im2col form computes dk as (168, R) x (R, 64): M = kh*kw*2C = 168, full
tiles. Usage: python tools/profile_stem_im2col.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

B, H, W, C, O = 8, 384, 512, 3, 64
rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.rand(B, H, W, C) * 2 - 1, jnp.bfloat16)
k0 = jnp.asarray(rng.rand(7, 7, C, O) * 0.1 - 0.05, jnp.bfloat16)


def _ws2d_inputs(x, k):
    kpad = jnp.pad(k, ((0, 0), (1, 0), (0, 0), (0, 0)))  # (7,8,C,O)
    k2 = kpad.reshape(7, 4, 2 * C, O)
    xp = jnp.pad(x, ((0, 0), (3, 3), (4, 2), (0, 0)))
    x2 = xp.reshape(B, H + 6, (W + 6) // 2, 2 * C)
    return x2, k2


def stem_conv(x, k):
    x2, k2 = _ws2d_inputs(x, k)
    return jax.lax.conv_general_dilated(
        x2, k2, (2, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def stem_im2col(x, k):
    x2, k2 = _ws2d_inputs(x, k)
    Ho, Wo = H // 2, W // 2
    parts = [x2[:, ky:ky + 2 * Ho:2, kx:kx + Wo, :]
             for ky in range(7) for kx in range(4)]
    p = jnp.concatenate(parts, axis=-1)            # (B, Ho, Wo, 28*2C)
    kmat = k2.reshape(28 * 2 * C, O)               # (ky, kx, c) row-major
    return jnp.einsum("bhwk,ko->bhwo", p, kmat)


def stem_im2col_parity(x, k):
    """Row-parity split first: every slice becomes stride-1."""
    x2, k2 = _ws2d_inputs(x, k)
    Ho, Wo = H // 2, W // 2
    xe, xo = x2[:, 0::2], x2[:, 1::2]
    parts = []
    for ky in range(7):
        src = (xe, xo)[ky % 2]
        r0 = ky // 2
        parts += [src[:, r0:r0 + Ho, kx:kx + Wo, :] for kx in range(4)]
    p = jnp.concatenate(parts, axis=-1)
    kmat = k2.reshape(28 * 2 * C, O)
    return jnp.einsum("bhwk,ko->bhwo", p, kmat)


def bench(fn, name, grad=False):
    if grad:
        f = jax.value_and_grad(
            lambda k, x: jnp.sum(fn(x, k).astype(jnp.float32) ** 2) * 1e-6)
        def run(x, k):
            v, gk = f(k, x)
            return v * 1e-3 + jnp.sum(gk.astype(jnp.float32))
    else:
        def run(x, k):
            return jnp.sum(fn(x, k).astype(jnp.float32))

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(x, k, eps, n):
        def body(carry, _):
            v = run((x.astype(jnp.float32) + carry * 1e-9 + eps).astype(x.dtype), k)
            return v, None
        v, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return v

    zero = jnp.float32(0.0)
    float(jax.device_get(chain(x0, k0, zero, n=1)))
    float(jax.device_get(chain(x0, k0, zero, n=17)))
    def best(n):
        b = float("inf")
        for t in range(3):
            t0 = time.time()
            float(jax.device_get(chain(x0, k0, jnp.float32(1e-6 * (t + 1)), n=n)))
            b = min(b, time.time() - t0)
        return b
    dt = (best(17) - best(1)) / 16
    print(f"{name}: {dt * 1e6:.0f} us", flush=True)


if __name__ == "__main__":
    a = stem_conv(x0, k0).astype(jnp.float32)
    for f in (stem_im2col, stem_im2col_parity):
        b = f(x0, k0).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(a - b)))
        print(f"{f.__name__} max|diff| vs conv: {err:.5f}")
    for grad in (False, True):
        tag = "fwd+dk" if grad else "fwd"
        bench(stem_conv, f"conv      {tag}", grad)
        bench(stem_im2col, f"im2col    {tag}", grad)
        bench(stem_im2col_parity, f"im2col-par{tag}", grad)
