"""Production-config remat ablation: with the fcp fusion the training memory
picture changed — find the FASTEST remat combo that still fits 15.75 GB."""
import functools
import time

import jax
import jax.numpy as jnp

from pips_tpu.data import SyntheticPointDataset, batch_iterator
from pips_tpu.models import Pips
from pips_tpu.train.optim import make_optimizer
from pips_tpu.train.step import TrainState, make_train_step

B, S, N, I = 1, 8, 768, 4
H, W = 368, 496

ds = SyntheticPointDataset(S=S, N=N, H=H, W=W, seed=125)
batch = next(batch_iterator(ds, batch_size=B, num_workers=2))
batch = {k: jnp.asarray(v) for k, v in batch.items()}

combos = [
    ("enc+mix+corr (r2 baseline)", dict(remat_encoder=True, remat_mixer=True, remat_corr=True)),
    ("corr only", dict(remat_encoder=False, remat_mixer=False, remat_corr=True)),
    ("mix+corr", dict(remat_encoder=False, remat_mixer=True, remat_corr=True)),
    ("none", dict(remat_encoder=False, remat_mixer=False, remat_corr=False)),
]

for name, remats in combos:
    try:
        model = Pips(S=S, stride=8, dtype=jnp.bfloat16, fuse_chanff=True, **remats)
        rng = jax.random.PRNGKey(0)
        params = model.init(rng, jnp.ones((1, 4, 2)), jnp.zeros((1, S, 64, 64, 3)), iters=1)
        tx = make_optimizer(5e-4, 100000)
        state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
        step = make_train_step(model, tx, iters=I, horz_flip=True, vert_flip=True)

        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(state, batch, eps, n, _step=step):
            b = dict(batch, rgbs=batch["rgbs"] + eps)
            def body(st, _):
                st, metrics = _step(st, b)
                return st, metrics["total_loss"]
            _, losses = jax.lax.scan(body, state, None, length=n)
            return losses[-1]

        t0 = time.time()
        float(jax.device_get(chain(state, batch, jnp.float32(0.0), n=1)))
        ct = time.time() - t0
        float(jax.device_get(chain(state, batch, jnp.float32(0.0), n=3)))
        def best(n):
            b_ = float("inf")
            for k in range(3):
                t0 = time.time()
                float(jax.device_get(chain(state, batch, jnp.float32(1e-6 * (k + 1)), n=n)))
                b_ = min(b_, time.time() - t0)
            return b_
        dt = (best(3) - best(1)) / 2
        print(f"{name}: {dt * 1e3:.0f} ms/step (compile {ct:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
