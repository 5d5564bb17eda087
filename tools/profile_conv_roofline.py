"""Encoder-conv roofline probe (VERDICT r2 #1): is XLA's conv strategy
leaving MXU throughput on the table at 64/96-channel stages?

For each hot encoder conv shape, measures (bf16, honest chain timing per
CLAUDE.md: serialized dependency chains, perturbed inputs, device_get
readback, min-of-3, both scan lengths warmed):
  conv     — lax.conv_general_dilated as the encoder runs it today
  im2col   — explicit patch extraction (9 shifted slices) + one matmul
             (contraction 9*C >= 576 fills all 128 MXU lanes, at the cost
             of materializing 9x activation traffic)
  matmul   — same-FLOP pure matmul (M,9C)x(9C,O): the MXU roofline for
             this contraction if patch formation were free

Run from repo root ON TPU: PYTHONPATH=/root/.axon_site:. python tools/profile_conv_roofline.py
"""
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def chain_time(make_step, carry0, reps=16, trials=3):
    """Per-step seconds of a serialized chain. make_step: carry -> carry."""
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(c0, n):
        def body(c, _):
            return make_step(c), None
        c, _ = jax.lax.scan(body, c0, None, length=n)
        return jnp.sum(c.astype(jnp.float32))

    short, long_ = 2, reps + 2
    for n in (short, long_):  # each static n is a separate compile
        float(jax.device_get(run(carry0, n)))

    def best(n):
        b = float("inf")
        for t in range(trials):
            c = carry0 + jnp.asarray(t * 1e-3, carry0.dtype)  # defeat caching
            float(jax.device_get(run(c, short)))  # sync queue
            t0 = time.perf_counter()
            float(jax.device_get(run(c, n)))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(long_) - best(short)) / (long_ - short)


def norm(y):
    # keep chain values bounded without a reduction barrier
    return y * jnp.asarray(0.05, y.dtype)


def make_conv(W, stride=1):
    def step(x):
        y = jax.lax.conv_general_dilated(
            x, W, (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return norm(y)
    return step


def im2col(x):
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + H, dx:dx + W, :] for dy in range(3) for dx in range(3)]
    return jnp.concatenate(cols, axis=-1)  # (B, H, W, 9C)


def make_im2col_mm(Wm):
    # Wm: (9C, O) with O == C so the chain closes
    def step(x):
        B, H, W, C = x.shape
        p = im2col(x).reshape(B * H * W, 9 * C)
        y = jax.lax.dot_general(p, Wm, (((1,), (0,)), ((), ())))
        return norm(y.reshape(B, H, W, C))
    return step


def make_matmul(Wm, K):
    # carry: (M, K) f.ex (BHW, 9C); two matmuls per step close the chain
    O = Wm.shape[1]
    Wb = jnp.asarray(np.random.RandomState(7).randn(O, K) * 0.05, Wm.dtype)

    def step(p):
        y = jax.lax.dot_general(p, Wm, (((1,), (0,)), ((), ())))
        p2 = jax.lax.dot_general(y, Wb, (((1,), (0,)), ((), ())))
        return norm(p2)
    return step


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    shapes = [
        # (name, B, H, W, Cin, Cout)  — bench config: 8 frames 384x512, /2../8
        ("stage1 192x256 c64", 8, 192, 256, 64, 64),
        ("stage2  96x128 c96", 8, 96, 128, 96, 96),
        ("stage3  48x64 c128", 8, 48, 64, 128, 128),
        ("fusion  48x64 416->256", 8, 48, 64, 416, 416),
    ]
    print(f"{'shape':24s} {'conv':>9s} {'im2col':>9s} {'matmul':>9s}   TF/s (conv/im2col/matmul)")
    for name, B, H, W, C, O in shapes:
        x = jnp.asarray(rng.randn(B, H, W, C) * 0.5, dt)
        Wc = jnp.asarray(rng.randn(3, 3, C, O) * 0.02, dt)
        Wm = jnp.asarray(rng.randn(9 * C, O) * 0.02, dt)
        flops = 2.0 * B * H * W * 9 * C * O

        t_conv = chain_time(make_conv(Wc), x)
        t_i2c = chain_time(make_im2col_mm(Wm), x)
        p0 = im2col(x).reshape(B * H * W, 9 * C)
        t_mm = chain_time(make_matmul(Wm, 9 * C), p0) / 2.0  # 2 matmuls/step

        tf = lambda t: flops / t / 1e12
        print(f"{name:24s} {t_conv*1e6:8.0f}u {t_i2c*1e6:8.0f}u {t_mm*1e6:8.0f}u"
              f"   {tf(t_conv):5.1f} / {tf(t_i2c):5.1f} / {tf(t_mm):5.1f}")


if __name__ == "__main__":
    main()
