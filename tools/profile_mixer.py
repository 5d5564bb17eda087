"""Micro-bench: DeltaBlock/MLPMixer at bench scale (B*N=128, S=8, kitchen=519).

Variants probe why mixer ops run ~40us each on 1MB tensors:
  current      - as shipped (LN f32 casts, swapaxes token mix)
  ln_bf16      - LayerNorm arithmetic in bf16 (stats still f32)
  flat2d       - channel FF on (B*S, D) 2D tensors, token FF via einsum
Timing: scan chains, device_get sync, n=1 vs n=33 differencing.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

BN, S, KITCHEN, D = 128, 8, 519, 512
DEPTH = 12
rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.rand(BN, S, KITCHEN) * 2 - 1, jnp.bfloat16)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


class MixerCurrent(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(D, dtype=jnp.bfloat16)(x)
        for d in range(DEPTH):
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x.astype(jnp.float32)).astype(x.dtype)
            h = jnp.swapaxes(h, 1, 2)
            h = nn.Dense(S * 4, dtype=jnp.bfloat16)(h)
            h = gelu(h)
            h = nn.Dense(S, dtype=jnp.bfloat16)(h)
            x = x + jnp.swapaxes(h, 1, 2)
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x.astype(jnp.float32)).astype(x.dtype)
            h = nn.Dense(D * 4, dtype=jnp.bfloat16)(h)
            h = gelu(h)
            h = nn.Dense(D, dtype=jnp.bfloat16)(h)
            x = x + h
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x.astype(jnp.float32)).astype(x.dtype)
        x = jnp.mean(x, axis=1)
        return nn.Dense(S * 130, dtype=jnp.bfloat16)(x)


class LNbf16(nn.Module):
    @nn.compact
    def __call__(self, x):  # stats f32, arithmetic bf16
        mean = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True) - jnp.square(mean)
        scale = jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
        g = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        xn = (x - mean.astype(x.dtype)) * scale.astype(x.dtype)
        return xn * g.astype(x.dtype) + b.astype(x.dtype)


class MixerLNbf16(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(D, dtype=jnp.bfloat16)(x)
        for d in range(DEPTH):
            h = LNbf16()(x)
            h = jnp.swapaxes(h, 1, 2)
            h = nn.Dense(S * 4, dtype=jnp.bfloat16)(h)
            h = gelu(h)
            h = nn.Dense(S, dtype=jnp.bfloat16)(h)
            x = x + jnp.swapaxes(h, 1, 2)
            h = LNbf16()(x)
            h = nn.Dense(D * 4, dtype=jnp.bfloat16)(h)
            h = gelu(h)
            h = nn.Dense(D, dtype=jnp.bfloat16)(h)
            x = x + h
        x = LNbf16()(x)
        x = jnp.mean(x, axis=1)
        return nn.Dense(S * 130, dtype=jnp.bfloat16)(x)


class MixerFlat2D(nn.Module):
    """Channel ops on (BN*S, D); token mix via einsum over s (no swapaxes)."""
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(D, dtype=jnp.bfloat16)(x)  # (BN, S, D)
        for d in range(DEPTH):
            h = LNbf16()(x)
            w1 = self.param(f"tk1_{d}", nn.initializers.lecun_normal(), (S, S * 4))
            b1 = self.param(f"tb1_{d}", nn.initializers.zeros, (S * 4,))
            w2 = self.param(f"tk2_{d}", nn.initializers.lecun_normal(), (S * 4, S))
            b2 = self.param(f"tb2_{d}", nn.initializers.zeros, (S,))
            t = jnp.einsum("bsd,st->btd", h, w1.astype(h.dtype)) + b1.astype(h.dtype)[None, :, None]
            t = gelu(t)
            t = jnp.einsum("btd,ts->bsd", t, w2.astype(h.dtype)) + b2.astype(h.dtype)[None, :, None]
            x = x + t
            h = LNbf16()(x).reshape(BN * S, D)
            h = nn.Dense(D * 4, dtype=jnp.bfloat16)(h)
            h = gelu(h)
            h = nn.Dense(D, dtype=jnp.bfloat16)(h)
            x = x + h.reshape(BN, S, D)
        x = LNbf16()(x)
        x = jnp.mean(x, axis=1)
        return nn.Dense(S * 130, dtype=jnp.bfloat16)(x)


def bench(mod, name):
    params = mod.init(jax.random.PRNGKey(0), x0)

    def loss(p, x):
        return jnp.sum(mod.apply(p, x).astype(jnp.float32) ** 2) * 1e-6

    gfn = jax.grad(loss)

    for tag, fn in (("fwd", lambda p, x: loss(p, x)),
                    ("fwd+bwd", lambda p, x: sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                                                 for l in jax.tree.leaves(gfn(p, x))) * 1e-6)):
        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(p, x, eps, n, fn=fn):
            def body(c, _):
                return fn(p, x + (c * 1e-9 + eps).astype(x.dtype)), None
            v, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return v
        zero = jnp.float32(0.0)
        float(jax.device_get(chain(params, x0, zero, n=1)))
        float(jax.device_get(chain(params, x0, zero, n=33)))
        def best(n):
            b = float("inf")
            for k in range(3):
                t0 = time.time()
                float(jax.device_get(chain(params, x0, jnp.float32(1e-6 * (k + 1)), n=n)))
                b = min(b, time.time() - t0)
            return b
        dt = (best(33) - best(1)) / 32
        print(f"{name} {tag}: {dt * 1e3:.2f} ms", flush=True)


bench(MixerCurrent(), "current")
bench(MixerLNbf16(), "ln_bf16")
bench(MixerFlat2D(), "flat2d")
