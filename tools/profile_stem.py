"""Micro-bench: stem 7x7/2 conv variants at (8,384,512,3) bf16.

Variants: direct strided conv, pad+reshape space-to-depth (current),
slice-based space-to-depth (no big padded copy).
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


def stem_direct(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def stem_s2d_pad(x, k):
    kpad = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k2 = kpad.reshape(4, 2, 4, 2, C, O).transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * C, O)
    xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
    Hp, Wp = (H + 8) // 2, (W + 8) // 2
    x2 = xp.reshape(B, Hp, 2, Wp, 2, C).transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, 4 * C)
    y = jax.lax.conv_general_dilated(x2, k2, (1, 1), "VALID",
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[:, : H // 2, : W // 2]


def stem_s2d_slice(x, k):
    kpad = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k2 = kpad.reshape(4, 2, 4, 2, C, O).transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * C, O)
    xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
    parts = [xp[:, a::2, b::2, :] for a in (0, 1) for b in (0, 1)]
    x2 = jnp.concatenate(parts, axis=-1)  # (B, Hp, Wp, 4C) order (a,b) major
    # reorder kernel channels to match concat order: channel block (a,b)
    k2r = kpad.reshape(4, 2, 4, 2, C, O).transpose(0, 2, 1, 3, 4, 5)  # (4,4,2,2,C,O)
    k2r = k2r.reshape(4, 4, 4 * C, O)
    y = jax.lax.conv_general_dilated(x2, k2r, (1, 1), "VALID",
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[:, : H // 2, : W // 2]


def bench(fn, name, grad=False):
    if grad:
        f = jax.grad(lambda x, k: jnp.sum(fn(x, k).astype(jnp.float32) ** 2) * 1e-6,
                     argnums=(0, 1))
        def run(x, k):
            gx, gk = f(x, k)
            return jnp.sum(gx.astype(jnp.float32)) * 1e-3 + jnp.sum(gk.astype(jnp.float32))
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


for nm, fn in [("direct", stem_direct), ("s2d-pad", stem_s2d_pad),
               ("s2d-slice", stem_s2d_slice)]:
    bench(fn, nm + " fwd")
    bench(fn, nm + " fwd+bwd", grad=True)

a = stem_direct(x0, k0).astype(jnp.float32)
for nm, fn in [("s2d-pad", stem_s2d_pad), ("s2d-slice", stem_s2d_slice)]:
    b = fn(x0, k0).astype(jnp.float32)
    print(nm, "maxdiff", float(jnp.max(jnp.abs(a - b))))
