"""Micro-bench: instance-norm variants at layer1 scale (8,192,256,64) bf16.

Timing: scan chains with device_get readback (CLAUDE.md rules).
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

B, H, W, C = 8, 192, 256, 64
x0 = jnp.asarray(np.random.RandomState(0).rand(B, H, W, C) * 4 - 2, jnp.bfloat16)


def in_current(x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def in_dot(x, eps=1e-5):
    Bx, Hx, Wx, Cx = x.shape
    K = Hx * Wx
    xr = x.reshape(Bx, K, Cx)
    ones = jnp.ones((K,), jnp.bfloat16)
    s1 = jnp.einsum("bkc,k->bc", xr, ones, preferred_element_type=jnp.float32)
    xf = xr.astype(jnp.float32)
    s2 = jnp.einsum("bkc,bkc->bc", xf, xf, preferred_element_type=jnp.float32)
    mean = (s1 / K)[:, None, None]
    var = jnp.maximum(s2 / K - jnp.square(s1 / K), 0.0)[:, None, None]
    xf4 = x.astype(jnp.float32).reshape(Bx, Hx, Wx, Cx)
    return ((xf4 - mean[..., None] * 0 - mean[:, :, :, None] * 0 - 0) * 1).astype(x.dtype)  # placeholder


def in_dot2(x, eps=1e-5):
    Bx, Hx, Wx, Cx = x.shape
    K = Hx * Wx
    xr = x.reshape(Bx, K, Cx)
    ones = jnp.ones((K,), jnp.bfloat16)
    s1 = jnp.einsum("bkc,k->bc", xr, ones, preferred_element_type=jnp.float32)
    s2 = jnp.einsum("bkc,bkc->bc", xr.astype(jnp.float32), xr.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    mean = s1 / K
    var = jnp.maximum(s2 / K - jnp.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps)
    out = (x.astype(jnp.float32) - mean[:, None, None, :]) * scale[:, None, None, :]
    return out.astype(x.dtype)


def in_bf16norm(x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps)
    return (x - mean.astype(x.dtype)) * scale.astype(x.dtype)


def bench(fn, name, grad=False):
    if grad:
        f = jax.grad(lambda x: jnp.sum(fn(x).astype(jnp.float32) ** 2) * 1e-6)
    else:
        f = fn

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(x, eps, n):
        def body(carry, _):
            y = f(carry + eps)
            return y.astype(carry.dtype) * 0.999 + carry * 0.001, None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    zero = jnp.float32(0.0)
    float(jax.device_get(chain(x0, zero, n=1)))
    float(jax.device_get(chain(x0, zero, n=17)))
    def best(n):
        b = float("inf")
        for k in range(3):
            t0 = time.time()
            float(jax.device_get(chain(x0, jnp.float32(1e-6 * (k + 1)), n=n)))
            b = min(b, time.time() - t0)
        return b
    dt = (best(17) - best(1)) / 16
    print(f"{name}: {dt * 1e6:.0f} us", flush=True)


for nm, fn in [("current", in_current), ("dot-stats", in_dot2),
               ("bf16-normalize", in_bf16norm)]:
    bench(fn, nm + " fwd")
for nm, fn in [("current", in_current), ("dot-stats", in_dot2),
               ("bf16-normalize", in_bf16norm)]:
    bench(fn, nm + " grad", grad=True)

# numerics check
a = in_current(x0).astype(jnp.float32)
b = in_dot2(x0).astype(jnp.float32)
c = in_bf16norm(x0).astype(jnp.float32)
print("dot-stats maxdiff", float(jnp.max(jnp.abs(a - b))))
print("bf16-norm maxdiff", float(jnp.max(jnp.abs(a - c))))
