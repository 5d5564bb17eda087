"""Measure ``batch_iterator`` throughput vs worker count at production config.

VERDICT r4 #4: the production recipe (N=768, 368x496, full augs) costs
~0.5-0.9 s of single-core host work per sample against a 0.43 s device
step — so feeding one chip needs >1 core, and a v5e-8 pod slice needs the
multiple measured here. Sweeps ``--workers`` (spawned processes, the
reference's processes-per-GPU model, ``train.py:228``) and reports
steady-state samples/s. NOTE: on a 1-core host every point saturates at
the single-core rate — run on a multi-core host for the real curve.

    python tools/profile_loader_scaling.py [flt_root] [--workers 1,2,4,8]
"""

import os
import sys
import time

sys.path.insert(0, ".")


def measure(root, n_workers, use_processes, n_batches, N, crop):
    from pips_tpu.data.flyingthings import FlyingThingsDataset
    from pips_tpu.data.loader import batch_iterator

    ds = FlyingThingsDataset(root, dset="TRAIN", N=N, crop_size=crop)
    it = batch_iterator(ds, batch_size=1, num_workers=n_workers,
                        use_processes=use_processes, seed=7)
    warm = max(2, n_workers)  # let each worker warm its decode caches
    for _ in range(warm):
        next(it)
    t0 = time.time()
    for _ in range(n_batches):
        next(it)
    dt = time.time() - t0
    it.close()
    return n_batches / dt


def main():
    root = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
        else "/tmp/flt_prod"
    workers = [int(w) for w in
               (sys.argv[sys.argv.index("--workers") + 1].split(",")
                if "--workers" in sys.argv else (1, 2, 4))]
    n_batches = int(sys.argv[sys.argv.index("--batches") + 1]) \
        if "--batches" in sys.argv else 10
    ncore = os.cpu_count()
    print(f"host cores: {ncore}; production config N=768 crop=368x496; "
          f"device step 0.43 s -> need >=2.33 samples/s/chip", flush=True)
    for w in workers:
        sps = measure(root, w, use_processes=w > 1, n_batches=n_batches,
                      N=768, crop=(368, 496))
        print(f"workers={w:2d} ({'procs' if w > 1 else 'threads'}): "
              f"{sps:5.2f} samples/s  ({sps / 2.33:.2f}x one-chip rate)",
              flush=True)


if __name__ == "__main__":
    main()
