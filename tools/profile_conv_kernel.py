"""Fused conv3x3 Pallas kernel vs XLA conv, encoder shapes, bf16, on TPU.
PYTHONPATH=/root/.axon_site:. python tools/profile_conv_kernel.py"""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from tools.profile_conv_roofline import chain_time, norm
from pips_tpu.kernels.conv_pallas import conv3x3_same, _ref_conv

def bench(B, H, W, C, O, dt=jnp.bfloat16):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C) * 0.5, dt)
    w = jnp.asarray(rng.randn(3, 3, C, O) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(O) * 0.05, jnp.float32)
    proj = jnp.asarray(rng.randn(1, 1, O, C) * 0.05, dt) if O != C else None

    def close(y):
        if proj is not None:
            y = jax.lax.conv_general_dilated(y, proj, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return norm(y)

    t_x = chain_time(lambda x: close(_ref_conv(x, w.astype(dt), b)), x)
    t_k = chain_time(lambda x: close(conv3x3_same(x, w, b)), x)
    f = 2.0 * B * H * W * 9 * C * O
    print(f"{H}x{W} {C}->{O}: xla {t_x*1e6:6.0f}us ({f/t_x/1e12:5.1f} TF/s)"
          f"  kernel {t_k*1e6:6.0f}us ({f/t_k/1e12:5.1f} TF/s)  "
          f"{'KERNEL' if t_k < t_x else 'xla'} x{max(t_x,t_k)/min(t_x,t_k):.2f}")

for shape in [(8,192,256,64,64), (8,96,128,64,64)]:
    bench(*shape)
