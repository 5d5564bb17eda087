"""Correctness + timing for kernels/stem_wgrad_pallas vs XLA conv autodiff.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_stem_wgrad.py
Scan-chain timed per CLAUDE.md rules (value readback, perturbed inputs,
min-of-3, both lengths warmed).
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from pips_tpu.kernels.stem_wgrad_pallas import stem_conv_s2d, stem_wgrad


def conv(x2, k2):
    return jax.lax.conv_general_dilated(
        x2, k2, (2, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def run(B, H, W, dtype, tag):
    C, O = 6, 64
    Ho, Wo = H // 2, W // 2
    Hp, Wp = 2 * Ho + 6, Wo + 3
    rng = np.random.RandomState(0)
    x2 = jnp.asarray(rng.rand(B, Hp, Wp, C) - 0.5, dtype)
    k2 = jnp.asarray(rng.rand(7, 4, C, O) * 0.1 - 0.05, dtype)
    dy = jnp.asarray(rng.rand(B, Ho, Wo, O) - 0.5, dtype)

    # numerics: pallas dk vs XLA autodiff dk (both f32-accumulated)
    def loss_x(k2):
        return jnp.sum(conv(x2, k2).astype(jnp.float32) * dy.astype(jnp.float32))

    dk_ref = jax.jit(jax.grad(loss_x))(k2).astype(jnp.float32)
    dk_pal = jax.jit(lambda: stem_wgrad(x2, dy))()
    err = float(jnp.max(jnp.abs(dk_pal - dk_ref)))
    scale = float(jnp.max(jnp.abs(dk_ref))) + 1e-9
    print(f"{tag}: dk max|err|={err:.4f} rel={err / scale:.2e}")

    # timing: fwd+wgrad chains
    def make_chain(f):
        def lv(k2, x2):
            v, gk = jax.value_and_grad(
                lambda k: jnp.sum(f(x2, k).astype(jnp.float32) ** 2) * 1e-6)(k2)
            return v * 1e-3 + jnp.sum(gk.astype(jnp.float32) ** 2)

        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(x2, k2, eps, n):
            def body(carry, _):
                v = lv(k2 + (carry * 1e-12 + eps).astype(k2.dtype), x2)
                return v, None
            v, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return v
        return chain

    def best(chain, n):
        b = float("inf")
        for t in range(3):
            t0 = time.time()
            float(jax.device_get(chain(x2, k2, jnp.float32(1e-6 * (t + 1)), n=n)))
            b = min(b, time.time() - t0)
        return b

    def conv_x7(x2, k2):
        # row-tap unfold: x7[b,h,w',ky*C+c] = x2[b,2h+ky,w',c]; the stem
        # becomes a stride-1 (1,4)-tap conv with C_in=7C=42 — fewer XLA
        # per-tap passes AND half the padded-lane HBM bytes (42->128 vs
        # 6->128 padding)
        Ho_ = (x2.shape[1] - 6) // 2
        x7 = jnp.concatenate(
            [x2[:, ky:ky + 2 * Ho_:2] for ky in range(7)], axis=-1)
        # k7[0, kx, ky*C+c, o] = k2[ky, kx, c, o]
        k7 = k2.transpose(1, 0, 2, 3).reshape(4, 7 * C, O)[None]
        return jax.lax.conv_general_dilated(
            x7, k7, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    b = conv_x7(x2, k2).astype(jnp.float32)
    a = conv(x2, k2).astype(jnp.float32)
    print(f"{tag} conv_x7 max|diff| vs conv: {float(jnp.max(jnp.abs(a - b))):.5f}")

    def make_fwd_chain(f):
        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(x2, k2, eps, n):
            def body(carry, _):
                v = jnp.sum(f(x2, k2 + (carry * 1e-12 + eps).astype(k2.dtype))
                            .astype(jnp.float32) ** 2)
                return v, None
            v, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return v
        return chain

    for mk, grad_tag in ((make_fwd_chain, "fwd   "), (make_chain, "fwd+dk")):
        for name, f in (("xla ", conv), ("pal ", stem_conv_s2d), ("x7  ", conv_x7)):
            ch = mk(f)
            zero = jnp.float32(0.0)
            float(jax.device_get(ch(x2, k2, zero, n=1)))
            float(jax.device_get(ch(x2, k2, zero, n=17)))
            dt = (best(ch, 17) - best(ch, 1)) / 16
            print(f"{tag} {name}{grad_tag}: {dt * 1e6:.0f} us", flush=True)


if __name__ == "__main__":
    run(1, 384, 512, jnp.bfloat16, "B=1 384x512 bf16")
    run(8, 384, 512, jnp.bfloat16, "B=8 384x512 bf16")
