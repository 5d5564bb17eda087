"""Trace the bf16 train step as ONE on-device scan chain and dump top HLO ops.
Usage: python tools/profile_trace_train2.py [fuse] [trace_dir]"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

from pips_tpu.data import SyntheticPointDataset, batch_iterator
from pips_tpu.models import Pips
from pips_tpu.train.optim import make_optimizer
from pips_tpu.train.step import TrainState, make_train_step

fuse = len(sys.argv) > 1 and sys.argv[1] in ("1", "true", "fuse")
trace_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/ttrace{int(fuse)}"

B, S, N, I = 1, 8, 128, 6
H, W = 384, 512

model = Pips(S=S, stride=8, dtype=jnp.bfloat16, fuse_chanff=fuse)
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
    b = dict(batch, rgbs=batch["rgbs"] + eps)
    def body(st, _):
        st, metrics = step(st, b)
        return st, metrics["total_loss"]
    _, losses = jax.lax.scan(body, state, None, length=n)
    return losses[-1]


print("warm", float(jax.device_get(chain(state, batch, jnp.float32(0.0), n=3))),
      flush=True)
jax.profiler.start_trace(trace_dir)
v = float(jax.device_get(chain(state, batch, jnp.float32(1e-6), n=3)))
jax.profiler.stop_trace()
print("traced", v, flush=True)
