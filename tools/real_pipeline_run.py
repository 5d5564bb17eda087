"""Close the data->train->eval loop through the REAL pipeline (VERDICT r2 #3):

  1. host-loader throughput probe: FlyingThingsDataset + full augs through
     batch_iterator (the exact train-time path), samples/sec vs the step time
  2. train on-chip via the standard train() driver (--dataset flyingthings),
     reporting rtime/itime per step like the reference's train.py prints
  3. eval run_flt on the held-out TEST split before/after, for the ATE trend

Needs a tree from tools/make_synth_flt.py (or real FlyingThings++).

    PYTHONPATH=/root/.axon_site:. python tools/real_pipeline_run.py \
        --root /tmp/flt_synth --steps 300
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def loader_probe(root, crop, N, workers=8, n_batches=12, use_augs=True,
                 use_processes=False):
    from pips_tpu.data import batch_iterator
    from pips_tpu.data.flyingthings import FlyingThingsDataset

    ds = FlyingThingsDataset(root, dset="TRAIN", subset="A", N=N, S=8,
                             crop_size=crop, use_augs=use_augs)
    it = batch_iterator(ds, batch_size=1, num_workers=workers, seed=1,
                        use_processes=use_processes)
    for _ in range(2):  # warm pools / caches / spawned workers
        next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = (time.perf_counter() - t0) / n_batches
    kind = "procs" if use_processes else "threads"
    print(f"loader: {1.0 / dt:.1f} samples/s at crop={crop} N={N} augs={use_augs} "
          f"{workers} {kind} ({dt * 1000:.0f} ms/batch)", flush=True)
    return 1.0 / dt


def run_eval(root, init_dir, iters=6, max_iters=8, crop=(184, 248), N=64):
    from pips_tpu.evals import run_flt

    out = run_flt.main(init_dir=init_dir, dataset_location=root, N=N,
                      crop_size=crop, max_iters=max_iters, iters=iters,
                      log_dir="/tmp/rpl_logs")
    return out


def main(root="/tmp/flt_synth", steps=300, crop_h=184, crop_w=248, N=128,
         lr=3e-4, dtype="bfloat16", workers=8, ckpt_dir="/tmp/rpl_ckpts",
         eval_iters=6, eval_max=8, val_every=0, probes=True):
    from pips_tpu.train.config import TrainConfig
    from pips_tpu.train.loop import train

    crop = (crop_h, crop_w)
    sps = float("nan")
    if probes:
        loader_probe(root, crop, N, workers=workers)  # thread baseline
        sps = loader_probe(root, crop, N, workers=workers, use_processes=True)

    print("eval BEFORE training (random init):", flush=True)
    before = run_eval(root, "random", iters=eval_iters, max_iters=eval_max,
                      crop=crop, N=64)

    cfg = TrainConfig(
        B=1, S=8, N=N, I=4, crop_size=crop, dataset="flyingthings",
        dataset_location=root, use_augs=True, dtype=dtype,
        horz_flip=True, vert_flip=True, max_iters=steps, lr=lr,
        log_freq=max(steps // 2, 1), val_freq=val_every or max(steps // 3, 1),
        val_batches=4, save_freq=min(steps, 500), keep_latest=1,
        ckpt_dir=ckpt_dir, log_dir="/tmp/rpl_train_logs",
        mesh_shape=(1, 1), metrics_every=10, num_workers=workers,
        loader_processes=True)
    t0 = time.time()
    metrics = train(cfg)
    ttime = time.time() - t0
    print(f"train: {steps} steps in {ttime:.0f}s "
          f"({ttime / steps * 1000:.0f} ms/step wall incl host)", flush=True)

    run_name = os.listdir(ckpt_dir)[0]
    print("eval AFTER training:", flush=True)
    after = run_eval(root, os.path.join(ckpt_dir, run_name),
                     iters=eval_iters, max_iters=eval_max, crop=crop, N=64)

    print("\n=== real-pipeline loop summary ===")
    print(f"loader {sps:.1f} samples/s; train {ttime / steps * 1000:.0f} ms/step wall; "
          f"ate_all before {before['ate_all']:.2f} -> after {after['ate_all']:.2f}; "
          f"ate_vis {before.get('ate_vis', float('nan')):.2f} -> "
          f"{after.get('ate_vis', float('nan')):.2f}")
    return {"loader_sps": sps, "before": before, "after": after,
            "ms_per_step_wall": ttime / steps * 1000}


if __name__ == "__main__":
    from pips_tpu.utils.cli import auto_cli
    print(auto_cli(main))
