"""One-off: bf16+fused train-step time after the stem row-unfold rewrite.

Compares against the r3 record (30.96 ms, CLAUDE.md) with the identical
scan-chain methodology. Run:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_step_after_stem.py
"""
import functools
import time

import jax
import jax.numpy as jnp

from pips_tpu.data import SyntheticPointDataset, batch_iterator
from pips_tpu.models import Pips
from pips_tpu.train.optim import make_optimizer
from pips_tpu.train.step import TrainState, make_train_step

B, S, N, I = 1, 8, 128, 6
H, W = 384, 512

model = Pips(S=S, stride=8, dtype=jnp.bfloat16, fuse_chanff=True)
rng = jax.random.PRNGKey(0)
params = model.init(rng, jnp.ones((1, 4, 2)), jnp.zeros((1, S, 64, 64, 3)), iters=1)
tx = make_optimizer(5e-4, 100000)
state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

ds = SyntheticPointDataset(S=S, N=N, H=H, W=W, seed=125)
batch = next(batch_iterator(ds, batch_size=B, num_workers=2))
batch = {k: jnp.asarray(v) for k, v in batch.items()}

step = make_train_step(model, tx, iters=I, horz_flip=False, vert_flip=False)


@functools.partial(jax.jit, static_argnames=("n",))
def chain(state, batch, eps, n):
    batch = dict(batch, rgbs=batch["rgbs"] + eps)
    def body(st, _):
        st, metrics = step(st, batch)
        return st, metrics["total_loss"]
    st, losses = jax.lax.scan(body, state, None, length=n)
    return losses[-1]


def best(n, trials=3):
    b = float("inf")
    for k in range(trials):
        t0 = time.time()
        float(jax.device_get(chain(state, batch, jnp.float32(1e-6 * (k + 1)), n)))
        b = min(b, time.time() - t0)
    return b


for n in (1, 17):
    t0 = time.time()
    float(jax.device_get(chain(state, batch, jnp.float32(0.0), n)))
    print(f"warm n={n}: {time.time() - t0:.1f}s", flush=True)

t1, t17 = best(1), best(17)
dt = (t17 - t1) / 16
print(f"train step bf16 fused: {dt * 1e3:.2f} ms  (t1={t1 * 1e3:.1f} t17={t17 * 1e3:.1f})")
