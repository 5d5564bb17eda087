"""Benchmark: train-step throughput at the reference's published config.

The only published timing in the reference is the train step at
B=1, S=8, N=128, I=6, crop 384x512 (no flips): ~0.35-0.53 s/step post-warmup
on a CUDA GPU (reference README.md:144-150). We report tracked
points*frames/sec for the same step on this chip vs the 0.43 s midpoint
baseline (128*8/0.43 = 2381 pf/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (+extras).
"""

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main(quick: bool = False):
    from pips_tpu.data import SyntheticPointDataset, batch_iterator
    from pips_tpu.models import Pips
    from pips_tpu.train.optim import make_optimizer
    from pips_tpu.train.step import TrainState, make_train_step

    B, S, N, I = 1, 8, 128, 6
    H, W = (256, 384) if quick else (384, 512)
    if quick:
        N, I = 32, 2

    model = Pips(S=S, stride=8)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.ones((1, 4, 2)), jnp.zeros((1, S, 64, 64, 3)), iters=1)
    tx = make_optimizer(5e-4, 100000)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    ds = SyntheticPointDataset(S=S, N=N, H=H, W=W, seed=125)
    batch = next(batch_iterator(ds, batch_size=B, num_workers=4))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    step = jax.jit(make_train_step(model, tx, iters=I, horz_flip=False,
                                   vert_flip=False), donate_argnums=(0,))

    # warmup/compile
    t0 = time.time()
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["total_loss"])
    compile_time = time.time() - t0

    n_steps = 3 if quick else 30
    t0 = time.time()
    for _ in range(n_steps):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["total_loss"])
    step_time = (time.time() - t0) / n_steps

    pf_per_sec = B * N * S / step_time
    baseline_pf_per_sec = 128 * 8 / 0.43  # reference README.md:144-150 midpoint

    # secondary: inference window throughput (davis-style dense tracking probe,
    # reference test_on_davis.py:111-129 uses chunks of 256 points at 480x1024)
    Ni = 256 if not quick else 64
    Hi, Wi = (480, 1024) if not quick else (256, 384)
    rng_np = np.random.RandomState(0)
    rgbs_i = jnp.asarray(rng_np.rand(1, S, Hi, Wi, 3) * 255, jnp.float32)
    xys_i = jnp.asarray(rng_np.rand(1, Ni, 2) * [Wi - 8, Hi - 8] + 4, jnp.float32)
    reps = 3 if quick else 10
    infer_iters = 6 if not quick else 2
    lims = jnp.asarray([Wi - 8.0, Hi - 8.0])

    # Chained-dependency timing: each window's queries derive from the
    # previous window's output, and the video is perturbed by the carry so
    # nothing is loop-invariant — this measures true serialized device time
    # (naive independent repeats can overlap/cache on tunneled platforms).
    @functools.partial(jax.jit, static_argnames=("n",))
    def bench_chain(params, xys0, rgbs, n):
        def body(xys, _):
            r = rgbs + xys[0, 0, 0] * 1e-12
            out = model.apply(params, xys, r, iters=infer_iters, is_train=False,
                              corr_mode="onehot")
            trajs = out.coord_predictions[-1]
            nxt = jnp.clip(trajs[:, -1] * 0.99 + 1.0, 8.0, lims)
            return nxt, jnp.mean(out.vis_e)
        xys_f, vs = jax.lax.scan(body, xys0, None, length=n)
        return jnp.sum(xys_f) + jnp.sum(vs)

    def time_chain(chain_fn):
        def timed(n):
            jax.block_until_ready(chain_fn(state.params, xys_i, rgbs_i, n))  # warm
            best = float("inf")
            for _ in range(3):  # min-of-3: the shared tunnel adds queue noise
                t0 = time.time()
                jax.block_until_ready(chain_fn(state.params, xys_i, rgbs_i, n))
                best = min(best, time.time() - t0)
            return best
        t_base = timed(1)
        t_n = timed(reps + 1)
        return max(t_n - t_base, 1e-9) / reps

    infer_time = time_chain(bench_chain)
    infer_tps = Ni * S / infer_time

    model_bf16 = Pips(S=S, stride=8, dtype=jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("n",))
    def bench_chain_bf16(params, xys0, rgbs, n):
        def body(xys, _):
            r = rgbs + xys[0, 0, 0] * 1e-12
            out = model_bf16.apply(params, xys, r, iters=infer_iters,
                                   is_train=False, corr_mode="onehot")
            trajs = out.coord_predictions[-1]
            nxt = jnp.clip(trajs[:, -1] * 0.99 + 1.0, 8.0, lims)
            return nxt, jnp.mean(out.vis_e)
        xys_f, vs = jax.lax.scan(body, xys0, None, length=n)
        return jnp.sum(xys_f) + jnp.sum(vs)

    infer_time_bf16 = time_chain(bench_chain_bf16)
    infer_tps_bf16 = Ni * S / infer_time_bf16

    print(json.dumps({
        "metric": "train_points_frames_per_sec",
        "value": round(pf_per_sec, 1),
        "unit": "points*frames/sec (train step, B=1 S=8 N=128 I=6, 384x512)",
        "vs_baseline": round(pf_per_sec / baseline_pf_per_sec, 2),
        "extra": {
            "train_step_time_s": round(step_time, 4),
            "compile_time_s": round(compile_time, 1),
            "inference_points_frames_per_sec": round(infer_tps, 1),
            "inference_window_time_s": round(infer_time, 4),
            "inference_bf16_points_frames_per_sec": round(infer_tps_bf16, 1),
            "inference_bf16_window_time_s": round(infer_time_bf16, 4),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
