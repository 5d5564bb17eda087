"""Benchmark: train-step throughput at the reference's published config.

The only published timing in the reference is the train step at
B=1, S=8, N=128, I=6, crop 384x512 (no flips): ~0.35-0.53 s/step post-warmup
on a CUDA GPU (reference README.md:144-150). We report tracked
points*frames/sec for the same step on this chip vs the 0.43 s midpoint
baseline (128*8/0.43 = 2381 pf/s).

Timing methodology (see CLAUDE.md): this platform overlaps/pipelines
independent dispatches AND ``block_until_ready`` can return before the
work ran, so EVERY measurement here is a serialized dependency chain
inside ONE device call — a ``lax.scan`` whose step consumes the previous
step's output — synchronized by ``device_get`` of a scalar that depends
on the whole chain (an actual value readback), with inputs perturbed per
trial so no request-level caching can serve a repeat, min-of-3, both
scan lengths warmed, and the per-step time recovered by differencing
chain lengths. We also report step FLOPs (XLA cost analysis) and MFU vs
the v5e bf16 peak so the number is physically checkable.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (+extras).
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

V5E_BF16_PEAK_FLOPS = 197e12  # per chip


def _min_of_3(fn, *args, _trial_eps=(1e-6, 2e-6, 3e-6)):
    """Time fn(*args, eps) by actual value readback; min over 3 perturbed
    trials (the shared tunnel adds queue noise; distinct eps defeats any
    result caching on the relay)."""
    best = float("inf")
    for eps in _trial_eps:
        t0 = time.time()
        float(jax.device_get(fn(*args, jnp.float32(eps))))
        best = min(best, time.time() - t0)
    return best


def _require_backend(timeout_s: float) -> None:
    """Fail fast with a diagnosable JSON line if the device backend never
    initializes (the tunneled TPU plugin blocks forever when its relay is
    down — a hang here would stall the whole bench harness)."""
    import threading

    done = threading.Event()
    info = {}

    def probe():
        try:
            info["device"] = str(jax.devices()[0])
        except Exception as e:  # pragma: no cover - backend-specific
            info["error"] = f"{type(e).__name__}: {e}"
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s) or "error" in info:
        err = info.get("error", f"backend init exceeded {timeout_s:.0f}s "
                                "(TPU tunnel down?)")
        print(json.dumps({"metric": "train_points_frames_per_sec",
                          "value": 0, "unit": "error", "vs_baseline": 0,
                          "error": err}))
        sys.exit(1)


def main(quick: bool = False):
    import os
    _require_backend(float(os.environ.get("PIPS_BENCH_INIT_TIMEOUT", "900")))
    # Persistent compile cache ON by default for the bench (validated against
    # the tunneled TPU plugin, docs/SERVING.md): the 4 model-variant compiles
    # dominate bench wall time (~8 min cold) and are identical across runs.
    # Opt out by exporting PIPS_JAX_CACHE= (empty).
    os.environ.setdefault("PIPS_JAX_CACHE", "1")
    from pips_tpu.utils.compcache import maybe_enable_compilation_cache
    maybe_enable_compilation_cache()
    from pips_tpu.data import SyntheticPointDataset, batch_iterator
    from pips_tpu.models import Pips
    from pips_tpu.train.optim import make_optimizer
    from pips_tpu.train.step import TrainState, make_train_step
    from pips_tpu.train.step import train_loss_fn  # noqa: F401 (doc pointer)

    B, S, N, I = 1, 8, 128, 6
    H, W = (256, 384) if quick else (384, 512)
    if quick:
        N, I = 32, 2

    rng = jax.random.PRNGKey(0)
    tx = make_optimizer(5e-4, 100000)

    ds = SyntheticPointDataset(S=S, N=N, H=H, W=W, seed=125)
    batch = next(batch_iterator(ds, batch_size=B, num_workers=4))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    train_reps = 2 if quick else 8

    def measure_train(dtype):
        """Serialized train-step time + FLOPs for one compute dtype."""
        fuse = dtype == jnp.bfloat16  # fused mixer kernel: bf16 path only
        model = Pips(S=S, stride=8, dtype=dtype, fuse_chanff=fuse)
        params = model.init(rng, jnp.ones((1, 4, 2)),
                            jnp.zeros((1, S, 64, 64, 3)), iters=1)
        state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
        step = make_train_step(model, tx, iters=I, horz_flip=False,
                               vert_flip=False)

        # Dynamic trip count (lax.while_loop): ONE executable serves every
        # chain length, so the n=1 and n=1+reps timings share a compile —
        # halves bench compile time and the persistent-cache footprint vs
        # the static-n scan (each static n was a separate full-step compile).
        # The serialized-dependency-chain property is identical: iteration
        # i+1 consumes iteration i's state, and the returned loss is the
        # last step's, so the readback waits on the whole chain.
        @jax.jit
        def chain(state, batch, eps, n):
            batch = dict(batch, rgbs=batch["rgbs"] + eps)

            def cond(c):
                return c[0] < n

            def body(c):
                i, st, _ = c
                st, metrics = step(st, batch)
                return (i + 1, st, metrics["total_loss"])

            _, _, loss = jax.lax.while_loop(
                cond, body, (jnp.int32(0), state, jnp.float32(0.0)))
            return loss  # scalar readback depending on the whole chain

        zero = jnp.float32(0.0)
        n1, nN = jnp.int32(1), jnp.int32(train_reps + 1)
        # AOT-compile once; the SAME executable serves cost analysis, warmup
        # and both timed lengths (a second jit dispatch would recompile)
        t0 = time.time()
        compiled = chain.lower(state, batch, zero, n1).compile()
        compile_time = time.time() - t0
        # step FLOPs: XLA cost analysis of this executable — the while body
        # (exactly one train step) is counted once. Two dedicated jit_step
        # compiles previously existed only for this count (~2 min + 110 MB
        # of compile cache); the chain count is 0.5% lower (loop overhead
        # optimizations), equally canonical.
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) if ca else 0.0
        float(jax.device_get(compiled(state, batch, zero, n1)))  # warm
        float(jax.device_get(compiled(state, batch, zero, nN)))  # warm
        t_base = _min_of_3(lambda s, b, e: compiled(s, b, e, n1), state, batch)
        t_n = _min_of_3(lambda s, b, e: compiled(s, b, e, nN), state, batch)
        step_time = max(t_n - t_base, 1e-9) / train_reps
        return step_time, flops, compile_time, model

    step_time_f32, flops_f32, compile_f32, _ = measure_train(None)
    step_time_bf16, flops_bf16_graph, compile_bf16, _ = measure_train(jnp.bfloat16)
    # XLA cost analysis does not count FLOPs inside pallas custom calls (the
    # bf16 graph runs the fused mixer kernel), so the kernel-free f32 graph's
    # count is the canonical step FLOPs for MFU on both paths
    flops_bf16 = flops_f32

    def mfu(flops, t):
        return flops / t / V5E_BF16_PEAK_FLOPS if (flops and t > 0) else 0.0

    pf_per_sec = B * N * S / step_time_bf16
    pf_per_sec_f32 = B * N * S / step_time_f32
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

    model_infer = Pips(S=S, stride=8)
    params_i = model_infer.init(rng, jnp.ones((1, 4, 2)),
                                jnp.zeros((1, S, 64, 64, 3)), iters=1)

    # Chained-dependency timing: each window's queries derive from the
    # previous window's output, and the video is perturbed by the carry so
    # nothing is loop-invariant.
    def make_bench_chain(model):
        # dynamic trip count: one compile serves both timed lengths (see the
        # train chain above for the serialization argument)
        @jax.jit
        def bench_chain(params, xys0, rgbs, eps, n):
            def cond(c):
                return c[0] < n

            def body(c):
                i, xys, _ = c
                r = rgbs + xys[0, 0, 0] * 1e-12 + eps
                out = model.apply(params, xys, r, iters=infer_iters,
                                  is_train=False, corr_mode="onehot")
                trajs = out.coord_predictions[-1]
                nxt = jnp.clip(trajs[:, -1] * 0.99 + 1.0, 8.0, lims)
                return (i + 1, nxt, jnp.mean(out.vis_e))

            _, xys_f, vs = jax.lax.while_loop(
                cond, body, (jnp.int32(0), xys0, jnp.float32(0.0)))
            return jnp.sum(xys_f) + vs
        return bench_chain

    def time_chain(chain_fn, xys, n_reps=None):
        n_reps = reps if n_reps is None else n_reps
        compiled = chain_fn.lower(params_i, xys, rgbs_i, jnp.float32(0.0),
                                  jnp.int32(1)).compile()

        def timed(n):
            n = jnp.int32(n)
            float(jax.device_get(
                compiled(params_i, xys, rgbs_i, jnp.float32(0.0), n)))  # warm
            return _min_of_3(lambda p, x, r, e: compiled(p, x, r, e, n),
                             params_i, xys, rgbs_i)
        t_base = timed(1)
        t_n = timed(n_reps + 1)
        return max(t_n - t_base, 1e-9) / n_reps

    infer_time = time_chain(make_bench_chain(model_infer), xys_i)
    infer_tps = Ni * S / infer_time

    model_infer_bf16 = Pips(S=S, stride=8, dtype=jnp.bfloat16,
                            fuse_chanff=True)
    infer_time_bf16 = time_chain(make_bench_chain(model_infer_bf16), xys_i)
    infer_tps_bf16 = Ni * S / infer_time_bf16

    # dense-grid serving probe (VERDICT r4 #7): the whole DAVIS-style grid in
    # ONE device call — N=7680 points over the same 480x1024 window (the
    # `run_davis --chunk 0` configuration, reference test_on_davis.py:111-129
    # does this in chunks of 256). Same dependency-chain timing discipline;
    # fewer reps (each rep is ~0.4 s of device time).
    Nd = 7680 if not quick else 256
    gx, gy = np.meshgrid(np.linspace(8, Wi - 8, 128 if not quick else 32),
                         np.linspace(8, Hi - 8, Nd // (128 if not quick else 32)))
    xys_d = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1)[None], jnp.float32)
    dense_time = time_chain(make_bench_chain(model_infer_bf16), xys_d,
                            n_reps=3 if not quick else 2)
    dense_tps = Nd * S / dense_time

    print(json.dumps({
        "metric": "train_points_frames_per_sec",
        "value": round(pf_per_sec, 1),
        "unit": "points*frames/sec (bf16 train step, B=1 S=8 N=128 I=6, 384x512)",
        "vs_baseline": round(pf_per_sec / baseline_pf_per_sec, 2),
        "extra": {
            "train_step_time_s_bf16": round(step_time_bf16, 4),
            "train_step_time_s_f32": round(step_time_f32, 4),
            "train_step_tflops": round(flops_bf16 / 1e12, 3),
            "train_step_tflops_f32_graph": round(flops_f32 / 1e12, 3),
            "train_mfu_bf16": round(mfu(flops_bf16, step_time_bf16), 3),
            "train_mfu_f32": round(mfu(flops_f32, step_time_f32), 3),
            "train_pf_per_sec_f32": round(pf_per_sec_f32, 1),
            "compile_time_s": round(compile_f32 + compile_bf16, 1),
            "inference_points_frames_per_sec": round(infer_tps, 1),
            "inference_window_time_s": round(infer_time, 4),
            "inference_bf16_points_frames_per_sec": round(infer_tps_bf16, 1),
            "inference_bf16_window_time_s": round(infer_time_bf16, 4),
            "dense_grid_points_frames_per_sec": round(dense_tps, 1),
            "dense_grid_window_time_s": round(dense_time, 4),
            "dense_grid_n_points": Nd,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
