"""End-to-end bf16 train step timing at the bench config (one compile:
fori_loop with a TRACED trip count serves every chain length).
Usage ON TPU: PYTHONPATH=/root/.axon_site:. python tools/profile_step.py <fuse_chanff 0/1> <fuse_conv3 0/1> [full_s2d 0/1, default 1]"""
import functools, sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from pips_tpu.data import SyntheticPointDataset, batch_iterator
from pips_tpu.models import Pips
from pips_tpu.train.optim import make_optimizer
from pips_tpu.train.step import TrainState, make_train_step

fc = sys.argv[1] == "1"; fv = sys.argv[2] == "1"
fs = len(sys.argv) < 4 or sys.argv[3] == "1"
B, S, N, I = 1, 8, 128, 6
H, W = 384, 512
model = Pips(S=S, stride=8, dtype=jnp.bfloat16, fuse_chanff=fc, fuse_conv3=fv,
             full_s2d=fs)
params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 4, 2)), jnp.zeros((1, S, 64, 64, 3)), iters=1)
tx = make_optimizer(5e-4, 100000)
state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
ds = SyntheticPointDataset(S=S, N=N, H=H, W=W, seed=125)
batch = {k: jnp.asarray(v) for k, v in next(batch_iterator(ds, batch_size=B, num_workers=4)).items()}
step = make_train_step(model, tx, iters=I, horz_flip=False, vert_flip=False)

@jax.jit
def chain(state, batch, eps, n):
    b = dict(batch, rgbs=batch["rgbs"] + eps)
    def body(i, carry):
        st, _ = carry
        st, m = step(st, b)
        return (st, m["total_loss"])
    _, loss = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))
    return loss

t0=time.time()
v = float(jax.device_get(chain(state, batch, jnp.float32(0.0), 2)))
print("compile+warm", time.time()-t0, v, flush=True)
best = float("inf")
for t in range(3):
    eps = jnp.float32(1e-6*(t+1))
    float(jax.device_get(chain(state, batch, eps, 2)))  # sync
    t0 = time.perf_counter()
    float(jax.device_get(chain(state, batch, eps, 10)))
    dt = time.perf_counter()-t0
    t2 = time.perf_counter()
    float(jax.device_get(chain(state, batch, eps, 2)))
    d2 = time.perf_counter()-t2
    best = min(best, (dt-d2)/8)
    print("trial", t, (dt-d2)/8, flush=True)
print(f"RESULT fuse_chanff={fc} fuse_conv3={fv} full_s2d={fs}: {best*1000:.2f} ms/step")
