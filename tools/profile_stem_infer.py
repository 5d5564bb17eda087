"""Stem A/B at train vs inference scale: W-s2d conv vs row-tap unfold (x7).

The r4 row-tap unfold won at B=1 384x512 (train config). The open question
(r4 cont.): does it still win forward-only at inference scale (480x1024),
where the concat's HBM traffic is paid but no weight-grad is saved?
Scan-chain timed per CLAUDE.md rules.

RESULT (v5e, r4): the unfold wins EVERYWHERE — an earlier partial-readback
probe (y[0,0,:2]) let XLA dead-code the baseline conv and made the unfold
look 28x slower at 480x1024; with full-sum readbacks it is 3.6x FASTER:

    B=1 384x512 bf16  s2d fwd 172 us | x7 fwd 180 us  (parity)
    B=1 384x512 bf16  s2d f+dk 695 us | x7 f+dk 257 us
    B=8 480x1024 bf16 s2d fwd 1153 us | x7 fwd 319 us
    B=8 480x1024 bf16 s2d f+dk 3384 us | x7 f+dk 1273 us

No mode gating needed; the unfold stays unconditional in the bf16 stem.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_stem_infer.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

C, O = 6, 64


def conv(x2, k2):
    return jax.lax.conv_general_dilated(
        x2, k2, (2, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_x7(x2, k2):
    Ho_ = (x2.shape[1] - 6) // 2
    x7 = jnp.concatenate(
        [x2[:, ky:ky + 2 * Ho_:2] for ky in range(7)], axis=-1)
    k7 = k2.transpose(1, 0, 2, 3).reshape(4, 7 * C, O)[None]
    return jax.lax.conv_general_dilated(
        x7, k7, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def run(B, H, W, dtype, tag):
    Ho, Wo = H // 2, W // 2
    Hp, Wp = 2 * Ho + 6, Wo + 3
    rng = np.random.RandomState(0)
    x2 = jnp.asarray(rng.rand(B, Hp, Wp, C) - 0.5, dtype)
    k2 = jnp.asarray(rng.rand(7, 4, C, O) * 0.1 - 0.05, dtype)

    a = conv(x2, k2).astype(jnp.float32)
    b = conv_x7(x2, k2).astype(jnp.float32)
    print(f"{tag} max|diff|: {float(jnp.max(jnp.abs(a - b))):.5f}")

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

    def make_grad_chain(f):
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

    for mk, grad_tag in ((make_fwd_chain, "fwd   "), (make_grad_chain, "fwd+dk")):
        for name, f in (("s2d ", conv), ("x7  ", conv_x7)):
            ch = mk(f)
            zero = jnp.float32(0.0)
            float(jax.device_get(ch(x2, k2, zero, n=1)))
            float(jax.device_get(ch(x2, k2, zero, n=17)))
            dt = (best(ch, 17) - best(ch, 1)) / 16
            print(f"{tag} {name}{grad_tag}: {dt * 1e6:.0f} us", flush=True)


if __name__ == "__main__":
    run(1, 384, 512, jnp.bfloat16, "B=1 384x512 bf16")
    run(8, 480, 1024, jnp.bfloat16, "B=8 480x1024 bf16")
