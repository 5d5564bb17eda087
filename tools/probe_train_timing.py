"""Probe: trustworthy train-step timing on the tunneled TPU.

Findings drive bench.py methodology. block_until_ready on this relay can
return without the value existing; only an actual device_get readback of a
value that depends on the whole chain is trustworthy. Inputs are perturbed
per call so no request-level caching can serve a repeat.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from pips_tpu.data import SyntheticPointDataset, batch_iterator
from pips_tpu.models import Pips
from pips_tpu.train.optim import make_optimizer
from pips_tpu.train.step import TrainState, make_train_step

B, S, N, I = 1, 8, 128, 6
H, W = 384, 512

model = Pips(S=S, stride=8, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
params = model.init(rng, jnp.ones((1, 4, 2)), jnp.zeros((1, S, 64, 64, 3)), iters=1)
tx = make_optimizer(5e-4, 100000)
state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

ds = SyntheticPointDataset(S=S, N=N, H=H, W=W, seed=125)
batch = next(batch_iterator(ds, batch_size=B, num_workers=4))
batch = {k: jnp.asarray(v) for k, v in batch.items()}

step = make_train_step(model, tx, iters=I, horz_flip=False, vert_flip=False)


@functools.partial(jax.jit, static_argnames=("n",))
def chain(state, batch, eps, n):
    batch = dict(batch, rgbs=batch["rgbs"] + eps)  # defeat request caching
    def body(st, _):
        st, metrics = step(st, batch)
        return st, metrics["total_loss"]
    st, losses = jax.lax.scan(body, state, None, length=n)
    return losses[-1]


def timed_get(n, eps):
    t0 = time.time()
    v = float(jax.device_get(chain(state, batch, eps, n)))
    return time.time() - t0, v


for n in (1, 4, 16):
    # compile
    t0 = time.time()
    float(jax.device_get(chain(state, batch, jnp.float32(0.0), n)))
    ct = time.time() - t0
    runs = []
    for k in range(3):
        dt, v = timed_get(n, jnp.float32(1e-6 * (k + 1)))
        runs.append(f"{dt:.4f}(loss={v:.3f})")
    print(f"n={n}: compile+run {ct:.1f}s, device_get runs {runs}", flush=True)

# cross-check: python loop, device_get sync, k dependent steps
jit_step = jax.jit(step)
st = state
st, m = jit_step(st, batch)
print("warm loop loss", float(jax.device_get(m["total_loss"])), flush=True)
for k in (5, 10, 20):
    t0 = time.time()
    cur = st
    for _ in range(k):
        cur, m = jit_step(cur, dict(batch, rgbs=batch["rgbs"]))
    v = float(jax.device_get(m["total_loss"]))
    print(f"python-loop k={k}: {time.time() - t0:.4f}s loss={v:.3f}", flush=True)
