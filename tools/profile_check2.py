import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, ".")
from pips_tpu.models import Pips

model = Pips(S=8, stride=8)
rng = np.random.RandomState(0)
Hi, Wi, N = 480, 1024, 256
rgbs = jnp.asarray(rng.rand(1, 8, Hi, Wi, 3) * 255, jnp.float32)
xys_list = [jnp.asarray(rng.rand(1, N, 2) * [Wi-8, Hi-8] + 4, jnp.float32) for _ in range(11)]
params = model.init(jax.random.PRNGKey(0), xys_list[0][:, :8], rgbs[:, :, :64, :64], iters=1)

fwd = jax.jit(lambda p, x, r: model.apply(p, x, r, iters=6, is_train=False,
                                          use_fused_corr=True).coord_predictions[-1])
_ = np.asarray(fwd(params, xys_list[0], rgbs))
t0 = time.time()
for i in range(10):
    out = np.asarray(fwd(params, xys_list[i+1], rgbs))  # host readback forces completion
print(f"vary-input with readback: {(time.time()-t0)/10*1e3:.2f} ms")

# sanity: a big matmul with known FLOPs
A = jnp.asarray(rng.rand(8192, 8192), jnp.float32)
mm = jax.jit(lambda a: a @ a)
_ = np.asarray(mm(A))
t0 = time.time()
out = mm(A)
for _ in range(9):
    out = mm(out / jnp.linalg.norm(out) * 100)
_ = np.asarray(out)
dt = (time.time()-t0)/10
print(f"8k matmul chain: {dt*1e3:.2f} ms -> {2*8192**3/dt/1e12:.1f} TFLOP/s")
