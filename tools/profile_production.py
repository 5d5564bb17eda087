"""Production-config train step on ONE chip, full batch (VERDICT r1 #4).

Config matches the reference reproduction recipe (train.py README: B=1 with
horz+vert flip doubling -> 4 effective, N=768, I=4, crop 368x496) WITHOUT
gradient accumulation: encoder/mixer/corr remat must fit the backward in
15.75 GB HBM. Reports scan-chain step time + device memory stats.
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

B, S, N, I = 1, 8, 768, 4
H, W = 368, 496  # reference train.py crop

# no remat: fits 15.75 GB since the fused-fcp rewrite (remat ablation in
# profile_production2.py: none 437 ms > corr 443 > mix+corr 538 > all 559)
model = Pips(S=S, stride=8, dtype=jnp.bfloat16, fuse_chanff=True)
rng = jax.random.PRNGKey(0)
params = model.init(rng, jnp.ones((1, 4, 2)), jnp.zeros((1, S, 64, 64, 3)),
                    iters=1)
tx = make_optimizer(5e-4, 100000)
state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

ds = SyntheticPointDataset(S=S, N=N, H=H, W=W, seed=125)
batch = next(batch_iterator(ds, batch_size=B, num_workers=2))
batch = {k: jnp.asarray(v) for k, v in batch.items()}

step = make_train_step(model, tx, iters=I, horz_flip=True, vert_flip=True)


@functools.partial(jax.jit, static_argnames=("n",))
def chain(state, batch, eps, n):
    b = dict(batch, rgbs=batch["rgbs"] + eps)
    def body(st, _):
        st, metrics = step(st, b)
        return st, metrics["total_loss"]
    _, losses = jax.lax.scan(body, state, None, length=n)
    return losses[-1]


t0 = time.time()
print("loss:", float(jax.device_get(chain(state, batch, jnp.float32(0.0), n=1))),
      f"(compile+run {time.time() - t0:.0f}s)", flush=True)
stats = jax.devices()[0].memory_stats() or {}
peak = stats.get("peak_bytes_in_use", 0)
print(f"peak HBM: {peak / 2**30:.2f} GiB "
      f"(limit {stats.get('bytes_limit', 0) / 2**30:.2f})", flush=True)

float(jax.device_get(chain(state, batch, jnp.float32(0.0), n=3)))
def best(n):
    b = float("inf")
    for k in range(3):
        t0 = time.time()
        float(jax.device_get(chain(state, batch, jnp.float32(1e-6 * (k + 1)), n=n)))
        b = min(b, time.time() - t0)
    return b
dt = (best(3) - best(1)) / 2
print(f"full-batch production step (4hv N=768 I=4 {H}x{W}, bf16, one chip): "
      f"{dt * 1e3:.0f} ms", flush=True)
