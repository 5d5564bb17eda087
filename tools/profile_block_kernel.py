"""Stage-granularity fused residual block vs the XLA s2d block (VERDICT r4 #2).

Compares, at the stage-1 bench shapes (8 frames, 192x256, 64ch, bf16):
  * XLA: the production ResidualBlock s2d path (packed-kernel convs +
    pair-combined instance norm, models/encoder.py) under jit/autodiff;
  * kernel: kernels/block_pallas.res_block64 — one custom-VJP boundary per
    block, IN stats in the conv epilogue, normalize+relu in the pass-2
    prologue.

Timing: serialized dependency chains (lax.scan whose step consumes the
previous output), scalar readback, perturbed inputs, min-of-3, both chain
lengths warmed — the CLAUDE.md discipline.

    PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_block_kernel.py

VERDICT (measured r5, one v5e chip, B=8 192x256 64ch bf16):

    fwd:      xla 1442us (40.2 TF/s)   kernel 1364us (42.5 TF/s)  1.06x
    fwd+bwd:  xla 2724us (63.9 TF/s)   kernel 3439us (50.6 TF/s)  0.79x

NEGATIVE for training; default-off. Why, quantitatively:

  * The relayout tax lives on the FORWARD IN/relu->conv edges only. XLA's
    own backward chains dgrad->wgrad with no normalization edges between
    convs and runs them at ~320us/conv — 2.2x faster than its forward's
    ~721us/conv. Killing the fwd edge (this kernel's whole premise) buys
    just 6% at stage-1 shapes because the r3 whole-stage s2d already
    mitigated stage-1; the r4 trace's remaining ~4.7ms of copies sits at
    the 96/128-ch stages whose s2d channel dims (192/256) exceed the
    128-lane tile this kernel packs for.
  * The hand backward pays the custom-VJP boundary four ways: two Pallas
    dgrads that merely match XLA's, XLA s2d wgrads that XLA also has, and
    ~6 unfused elementwise/reduce HBM passes (yh1 recompute, two IN
    backwards with their means, the residual tail) that XLA fuses into
    its conv epilogues — 2075us vs XLA's 1282us for the same math.

Same conclusion family as kernels/stem_wgrad_pallas.py: reshape layouts so
the standard conv is well-shaped (the s2d/unfold rewrites) beats replacing
XLA's conv pipeline wholesale once autodiff is in the picture.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def chain_time(step_fn, x0, reps=8):
    """Per-step time of a serialized chain, differenced over chain length."""
    def chain(x, eps, n):
        def body(c, _):
            return step_fn(c * (1.0 + eps)), None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    f1 = jax.jit(lambda x, e: chain(x, e, 1))
    fn = jax.jit(lambda x, e: chain(x, e, reps + 1))

    def timed(f):
        best = float("inf")
        for eps in (1e-6, 2e-6, 3e-6):
            e = jnp.bfloat16(eps) if x0.dtype == jnp.bfloat16 else jnp.float32(eps)
            t0 = time.time()
            float(jax.device_get(f(x0, e)))
            best = min(best, time.time() - t0)
        return best

    for f in (f1, fn):  # warm both lengths
        float(jax.device_get(f(x0, jnp.bfloat16(0.0) if x0.dtype == jnp.bfloat16
                              else jnp.float32(0.0))))
    return max(timed(fn) - timed(f1), 1e-9) / reps


def main(B=8, H=192, W=256, C=64, dtype="bfloat16"):
    from flax.core import freeze
    from pips_tpu.kernels.block_pallas import res_block64
    from pips_tpu.models.encoder import ResidualBlock

    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C), dt)
    w1 = jnp.asarray(rng.randn(3, 3, C, C) * 0.06, jnp.float32)
    w2 = jnp.asarray(rng.randn(3, 3, C, C) * 0.06, jnp.float32)
    b1 = jnp.zeros((C,), jnp.float32)
    b2 = jnp.zeros((C,), jnp.float32)

    blk = ResidualBlock(C, 1, dtype=dt, s2d=True)
    params = freeze({"params": {
        "conv1": {"Conv_0": {"kernel": w1, "bias": b1}},
        "conv2": {"Conv_0": {"kernel": w2, "bias": b2}},
    }})

    def xla_block(xi):
        return blk.apply(params, xi)

    def krn_block(xi):
        return res_block64(xi, w1, b1, w2, b2)

    # parity check on-device first
    yx = jax.jit(xla_block)(x)
    yk = jax.jit(krn_block)(x)
    err = float(jnp.abs(yx.astype(jnp.float32) - yk.astype(jnp.float32)).max())
    print(f"fwd parity max|diff| = {err:.4f} (bf16 scale)", flush=True)

    # FLOPs (logical, per block fwd): 2 convs
    fl_fwd = 2 * (B * H * W * 9 * C * C * 2)

    t_x = chain_time(xla_block, x)
    t_k = chain_time(krn_block, x)
    print(f"fwd:      xla {t_x*1e6:7.0f}us ({fl_fwd/t_x/1e12:5.1f} TF/s logical)"
          f"   kernel {t_k*1e6:7.0f}us ({fl_fwd/t_k/1e12:5.1f} TF/s)  "
          f"ratio {t_x/t_k:.2f}x", flush=True)

    # full train-mode backward: grads wrt x AND both conv kernels (folded
    # into the carry at zero weight so the chain forces their computation)
    def xla_vg(xi):
        dx, dp = jax.grad(
            lambda v, p: jnp.sum(blk.apply(p, v).astype(jnp.float32)),
            argnums=(0, 1))(xi, params)
        wsum = sum(jnp.sum(l) for l in jax.tree.leaves(dp))
        return dx + (0.0 * wsum).astype(dx.dtype)

    def krn_vg(xi):
        dx, dw1, dw2 = jax.grad(
            lambda v, a, b: jnp.sum(res_block64(v, a, b1, b, b2)
                                    .astype(jnp.float32)),
            argnums=(0, 1, 2))(xi, w1, w2)
        wsum = jnp.sum(dw1) + jnp.sum(dw2)
        return dx + (0.0 * wsum).astype(dx.dtype)

    t_xg = chain_time(xla_vg, x)
    t_kg = chain_time(krn_vg, x)
    fl_all = 3 * fl_fwd
    print(f"fwd+bwd:  xla {t_xg*1e6:7.0f}us ({fl_all/t_xg/1e12:5.1f} TF/s logical)"
          f"   kernel {t_kg*1e6:7.0f}us ({fl_all/t_kg/1e12:5.1f} TF/s)  "
          f"ratio {t_xg/t_kg:.2f}x", flush=True)
    return {"fwd_xla": t_x, "fwd_kernel": t_k,
            "bwd_xla": t_xg, "bwd_kernel": t_kg}


if __name__ == "__main__":
    from pips_tpu.utils.cli import auto_cli
    auto_cli(main)
