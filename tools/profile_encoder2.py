"""Per-stage encoder costs. Run from repo root."""
import functools, sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, ".")

def chain_time(step_fn, carry0, reps=4):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(c0, n):
        def body(c, _):
            return c * (1.0 + step_fn(c) * 1e-12), None
        c, _ = jax.lax.scan(body, c0, None, length=n)
        return jnp.sum(c)
    for n in (1, reps + 1):
        jax.block_until_ready(run(carry0, n))
    def best(n):
        b = float("inf")
        for _ in range(3):
            t0 = time.time(); jax.block_until_ready(run(carry0, n)); b = min(b, time.time()-t0)
        return b
    return max(best(reps + 1) - best(1), 1e-9) / reps

rng = np.random.RandomState(0)
B, H, W = 8, 480, 1024
x0 = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
k7 = jnp.asarray(rng.rand(7, 7, 3, 64) * 0.01, jnp.float32)

def conv(x, k, stride, pad):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

print(f"stem 7x7s2 3->64   : {chain_time(lambda x: jnp.mean(conv(x, k7, 2, 3)), x0)*1e3:.2f} ms")

x1 = jnp.asarray(rng.rand(B, 240, 512, 64), jnp.float32)
k3 = jnp.asarray(rng.rand(3, 3, 64, 64) * 0.01, jnp.float32)
print(f"3x3 64->64 @240x512: {chain_time(lambda x: jnp.mean(conv(x, k3, 1, 1)), x1)*1e3:.2f} ms")

x2 = jnp.asarray(rng.rand(B, 60, 128, 416), jnp.float32)
k4 = jnp.asarray(rng.rand(3, 3, 416, 256) * 0.01, jnp.float32)
print(f"3x3 416->256 @60x128: {chain_time(lambda x: jnp.mean(conv(x, k4, 1, 1)), x2)*1e3:.2f} ms")

from pips_tpu.models.encoder import instance_norm
print(f"instnorm @240x512x64: {chain_time(lambda x: jnp.mean(instance_norm(x)), x1)*1e3:.2f} ms")

from pips_tpu.ops.resize import resize_bilinear_align_corners
print(f"resize 240x512->60x128: {chain_time(lambda x: jnp.mean(resize_bilinear_align_corners(x, (60,128))), x1)*1e3:.2f} ms")
