"""Ablate the bf16 train step at bench config to find where the ~40ms goes.

All timings: scan chains, device_get scalar sync, perturbed inputs, min-of-3,
differenced chain lengths (see CLAUDE.md timing rules).
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from pips_tpu.data import SyntheticPointDataset, batch_iterator
from pips_tpu.models import Pips
from pips_tpu.models.losses import balanced_ce_loss, sequence_loss
from pips_tpu.ops.reduce import reduce_masked_mean
from pips_tpu.train.optim import make_optimizer
from pips_tpu.train.step import TrainState, make_train_step, train_loss_fn

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


def loss_no_ce(params, b):
    out = model.apply(params, b["trajs"][:, 0], b["rgbs"], iters=I,
                      is_train=True, corr_mode="onehot")
    seq = sequence_loss(out.coord_predictions, b["trajs"], b["visibles"],
                        b["valids"], 0.8)
    vis, _ = balanced_ce_loss(out.vis_e, b["visibles"], b["valids"])
    return seq + vis * 10.0


def loss_full(params, b):
    return train_loss_fn(model, params, b, I)[0]


def fwd_only(params, b):
    out = model.apply(params, b["trajs"][:, 0], b["rgbs"], iters=I,
                      is_train=False, corr_mode="onehot")
    return jnp.sum(out.coord_predictions[-1]) * 1e-6 + jnp.mean(out.vis_e)


def encoder_only(params, b):
    fm = model.apply(params, b["rgbs"], method=Pips.encode)
    return jnp.sum(fm.astype(jnp.float32)) * 1e-9


def grad_step(loss_fn):
    g = jax.grad(loss_fn)
    def f(params, b):
        gr = g(params, b)
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in
                   jax.tree.leaves(gr)) * 1e-9
    return f


def timed_chain(fn, name, reps=8):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(params, b, eps, n):
        b = dict(b, rgbs=b["rgbs"] + eps)
        def body(carry, _):
            v = fn(params, dict(b, rgbs=b["rgbs"] + carry * 1e-9))
            return v, None
        v, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return v

    zero = jnp.float32(0.0)
    float(jax.device_get(chain(params, batch, zero, n=1)))
    float(jax.device_get(chain(params, batch, zero, n=reps + 1)))
    def best(n):
        b = float("inf")
        for k in range(3):
            t0 = time.time()
            float(jax.device_get(chain(params, batch, jnp.float32(1e-6 * (k + 1)), n=n)))
            b = min(b, time.time() - t0)
        return b
    dt = (best(reps + 1) - best(1)) / reps
    print(f"{name}: {dt * 1e3:.1f} ms", flush=True)
    return dt


timed_chain(encoder_only, "encoder fwd only")
timed_chain(fwd_only, "full fwd (track, onehot, no loss)")
timed_chain(grad_step(loss_no_ce), "fwd+bwd, NO ce/fcp")
timed_chain(grad_step(loss_full), "fwd+bwd, full loss (ce in-loop)")
