"""Pure-XLA lane-widening rewrites for the encoder's small-channel convs.

The roofline probe (profile_conv_roofline.py) showed 64/96-channel 3x3 convs
run at ~50 TF/s bf16 on v5e while 128-channel runs ~146 TF/s — XLA's per-tap
conv strategy fills K = C_in of the MXU's 128 lanes, and time is invariant
to C_in below 128. Two HLO-level rewrites that keep autodiff + XLA fusion
(unlike the Pallas kernel, kernels/conv_pallas.py, whose custom-VJP boundary
cost more than the occupancy win):

  s2d    — W-only space-to-depth: (H, W, C) -> (H, W/2, 2C) is a FREE
           reshape in NHWC. A 3x3 conv on the original becomes a 3x3 conv
           on the s2d layout with a packed (3, 3, 2C, 2O) kernel
           (k2[dy, m, a'*C+c, a*O+o] = w[dy, 2m+a'-a-1, c, o], 50%
           structural zeros): 2x padded FLOPs, but half the rows at full
           128-lane K and N occupancy -> fewer MXU passes overall.
  pad128 — zero-pad C_in/C_out up to 128 (for the 96-channel stage):
           (128/96)^2 = 1.78x padded FLOPs at full-lane throughput.

Run from repo root ON TPU:
    PYTHONPATH=/root/.axon_site:. python tools/profile_conv_s2d.py
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from tools.profile_conv_roofline import chain_time, make_conv, norm  # noqa: E402


def pack_s2d_kernel(w):
    """w (3, 3, C, O) -> (3, 3, 2C, 2O) operating on the W-s2d layout."""
    C, O = w.shape[2], w.shape[3]
    k2 = np.zeros((3, 3, 2 * C, 2 * O), np.float32)
    w = np.asarray(w, np.float32)
    for m in range(3):
        for ap in range(2):
            for a in range(2):
                dx = 2 * (m - 1) + ap - a + 1
                if 0 <= dx < 3:
                    k2[:, m, ap * C:(ap + 1) * C, a * O:(a + 1) * O] = w[:, dx]
    return k2


def make_conv_s2d(K2):
    def step(x2):  # x2: (B, H, W2, 2C), layout-identical to (B, H, W, C)
        y = jax.lax.conv_general_dilated(
            x2, K2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return norm(y)
    return step


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    # --- stage-1 shape: 8x192x256, 64 -> 64 ---
    B, H, W, C, O = 8, 192, 256, 64, 64
    x = jnp.asarray(rng.randn(B, H, W, C) * 0.5, dt)
    w = rng.randn(3, 3, C, O) * 0.02
    flops = 2.0 * B * H * W * 9 * C * O

    t_conv = chain_time(make_conv(jnp.asarray(w, dt)), x)
    k2 = jnp.asarray(pack_s2d_kernel(w), dt)
    x2 = x.reshape(B, H, W // 2, 2 * C)
    t_s2d = chain_time(make_conv_s2d(k2), x2)
    # correctness
    y_ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(w, dt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_s2d = jax.lax.conv_general_dilated(
        x2, k2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")).reshape(B, H, W, O)
    err = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)
                                - y_s2d.astype(jnp.float32))))
    print(f"stage1 64ch 192x256:  conv {t_conv*1e6:6.0f}us ({flops/t_conv/1e12:5.1f} TF/s)"
          f"  s2d {t_s2d*1e6:6.0f}us ({flops/t_s2d/1e12:5.1f} math-TF/s)"
          f"  x{t_conv/t_s2d:.2f}  maxerr {err:.4f}", flush=True)

    # --- stage-2 shape: 8x96x128, 96 -> 96: pad128 ---
    B, H, W, C, O = 8, 96, 128, 96, 96
    x = jnp.asarray(rng.randn(B, H, W, C) * 0.5, dt)
    w = rng.randn(3, 3, C, O) * 0.02
    flops = 2.0 * B * H * W * 9 * C * O
    t_conv = chain_time(make_conv(jnp.asarray(w, dt)), x)

    wp = np.zeros((3, 3, 128, 128), np.float32)
    wp[:, :, :C, :O] = w
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - C)))

    def step_pad(xp):
        y = jax.lax.conv_general_dilated(
            xp, jnp.asarray(wp, dt), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return norm(y)
    t_pad = chain_time(step_pad, xp)
    print(f"stage2 96ch  96x128:  conv {t_conv*1e6:6.0f}us ({flops/t_conv/1e12:5.1f} TF/s)"
          f"  pad128 {t_pad*1e6:6.0f}us ({flops/t_pad/1e12:5.1f} math-TF/s)"
          f"  x{t_conv/t_pad:.2f}", flush=True)

    # --- stage-2 s2d without padding: 96 -> 192 lanes (over 128; 2 passes) ---
    k2 = jnp.asarray(pack_s2d_kernel(w), dt)
    x2 = x.reshape(B, H, W // 2, 2 * C)
    t_s2d2 = chain_time(make_conv_s2d(k2), x2)
    print(f"stage2 96ch  s2d(192 lanes): {t_s2d2*1e6:6.0f}us"
          f" ({flops/t_s2d2/1e12:5.1f} math-TF/s)  x{t_conv/t_s2d2:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
