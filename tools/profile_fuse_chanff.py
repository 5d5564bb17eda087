"""On-TPU check + timing of the fused channel-FF mixer kernel.

1. compile + numerics vs the unfused bf16 path (loose bf16 tolerance)
2. scan-chain timing (CLAUDE.md rules) of the bf16 train step and the
   inference window with fuse_chanff on/off.
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

rng = jax.random.PRNGKey(0)
ds = SyntheticPointDataset(S=S, N=N, H=H, W=W, seed=125)
batch = next(batch_iterator(ds, batch_size=B, num_workers=2))
batch = {k: jnp.asarray(v) for k, v in batch.items()}

# --- numerics: fused vs unfused forward on identical params ---
m0 = Pips(S=S, stride=8, dtype=jnp.bfloat16, fuse_chanff=False)
m1 = Pips(S=S, stride=8, dtype=jnp.bfloat16, fuse_chanff=True)
params = m0.init(rng, jnp.ones((1, 4, 2)), jnp.zeros((1, S, 64, 64, 3)), iters=1)

xys = batch["trajs"][:, 0]
out0 = jax.jit(lambda p: m0.apply(p, xys, batch["rgbs"], iters=2,
                                  is_train=False, corr_mode="onehot")
               .coord_predictions)(params)
out1 = jax.jit(lambda p: m1.apply(p, xys, batch["rgbs"], iters=2,
                                  is_train=False, corr_mode="onehot")
               .coord_predictions)(params)
d = np.abs(np.asarray(out0, np.float32) - np.asarray(out1, np.float32))
print(f"fused-vs-unfused coords: median {np.median(d):.4f} "
      f"max {d.max():.4f} (px)", flush=True)


def time_train(fuse):
    model = Pips(S=S, stride=8, dtype=jnp.bfloat16, fuse_chanff=fuse)
    tx = make_optimizer(5e-4, 100000)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_train_step(model, tx, iters=I, horz_flip=False, vert_flip=False)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(state, batch, eps, n):
        b = dict(batch, rgbs=batch["rgbs"] + eps)
        def body(st, _):
            st, metrics = step(st, b)
            return st, metrics["total_loss"]
        _, losses = jax.lax.scan(body, state, None, length=n)
        return losses[-1]

    zero = jnp.float32(0.0)
    float(jax.device_get(chain(state, batch, zero, n=1)))
    float(jax.device_get(chain(state, batch, zero, n=9)))
    def best(n):
        b = float("inf")
        for k in range(3):
            t0 = time.time()
            float(jax.device_get(chain(state, batch, jnp.float32(1e-6 * (k + 1)), n=n)))
            b = min(b, time.time() - t0)
        return b
    dt = (best(9) - best(1)) / 8
    print(f"train step bf16 fuse={fuse}: {dt * 1e3:.1f} ms", flush=True)


def time_infer(fuse):
    Ni, Hi, Wi = 256, 480, 1024
    r = np.random.RandomState(0)
    rgbs_i = jnp.asarray(r.rand(1, S, Hi, Wi, 3) * 255, jnp.float32)
    xys_i = jnp.asarray(r.rand(1, Ni, 2) * [Wi - 8, Hi - 8] + 4, jnp.float32)
    lims = jnp.asarray([Wi - 8.0, Hi - 8.0])
    model = Pips(S=S, stride=8, dtype=jnp.bfloat16, fuse_chanff=fuse)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(p, xys0, eps, n):
        def body(xys, _):
            rr = rgbs_i + xys[0, 0, 0] * 1e-12 + eps
            out = model.apply(p, xys, rr, iters=6, is_train=False,
                              corr_mode="onehot")
            nxt = jnp.clip(out.coord_predictions[-1][:, -1] * 0.99 + 1.0, 8.0, lims)
            return nxt, jnp.mean(out.vis_e)
        xys_f, vs = jax.lax.scan(body, xys0, None, length=n)
        return jnp.sum(xys_f) + jnp.sum(vs)

    float(jax.device_get(chain(params, xys_i, jnp.float32(0.0), n=1)))
    float(jax.device_get(chain(params, xys_i, jnp.float32(0.0), n=11)))
    def best(n):
        b = float("inf")
        for k in range(3):
            t0 = time.time()
            float(jax.device_get(chain(params, xys_i, jnp.float32(1e-6 * (k + 1)), n=n)))
            b = min(b, time.time() - t0)
        return b
    dt = (best(11) - best(1)) / 10
    print(f"inference window bf16 fuse={fuse}: {dt * 1e3:.1f} ms", flush=True)


time_train(False)
time_train(True)
time_infer(False)
time_infer(True)
