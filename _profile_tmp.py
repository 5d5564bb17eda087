import time
import numpy as np
import jax, jax.numpy as jnp
from pips_tpu.models import Pips

model = Pips(S=8, stride=8)
rng = np.random.RandomState(0)
Ni, Hi, Wi = 256, 480, 1024
rgbs = jnp.asarray(rng.rand(1, 8, Hi, Wi, 3) * 255, jnp.float32)
xys = jnp.asarray(rng.rand(1, Ni, 2) * [Wi - 8, Hi - 8] + 4, jnp.float32)
params = model.init(jax.random.PRNGKey(0), xys, rgbs[:, :, :64, :64], iters=1)

def timeit(fn, *args, reps=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps

encode = jax.jit(lambda p, r: model.apply(p, r, method=Pips.encode))
fmaps = encode(params, rgbs)
t_enc = timeit(encode, params, rgbs)

for fused in (True, False):
    track = jax.jit(lambda p, f, x: model.apply(
        p, f, x, iters=6, is_train=False, use_fused_corr=fused,
        method=Pips.track).coord_predictions[-1])
    t_track = timeit(track, params, fmaps, xys)
    print(f"fused={fused}: track {t_track*1e3:.2f} ms")
print(f"encode: {t_enc*1e3:.2f} ms")

full = jax.jit(lambda p, x, r: model.apply(p, x, r, iters=6, is_train=False,
                                           use_fused_corr=True).coord_predictions[-1])
print(f"full fwd: {timeit(full, params, xys, rgbs)*1e3:.2f} ms")

# dense N (davis full grid at once: 60*128=7680 points)
Nd = 7680
xys_d = jnp.asarray(rng.rand(1, Nd, 2) * [Wi - 8, Hi - 8] + 4, jnp.float32)
for fused in (True, False):
    track = jax.jit(lambda p, f, x: model.apply(
        p, f, x, iters=6, is_train=False, use_fused_corr=fused,
        method=Pips.track).coord_predictions[-1])
    try:
        t = timeit(track, params, fmaps, xys_d, reps=3)
        print(f"dense N={Nd} fused={fused}: {t*1e3:.2f} ms ({Nd*8/t:.0f} pf/s)")
    except Exception as e:
        print(f"dense fused={fused} failed: {type(e).__name__}: {str(e)[:200]}")
