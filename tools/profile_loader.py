"""Profile the FlyingThings++ host loader: per-stage aug costs + warm
end-to-end sample times. Reproduces the README "host loader" numbers.

Usage: python tools/profile_loader.py [flt_root] [--N 768] [--crop 368,496]
(default tree: /tmp/flt_synth, built by tools/make_synth_flt.py)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")  # run from the repo root


def bench_stage(fn, reps=3):
    best = 1e9
    for _ in range(reps):
        rng = np.random.RandomState(1)
        t0 = time.time()
        fn(rng)
        best = min(best, time.time() - t0)
    return best


def main():
    from pips_tpu.data import augs
    from pips_tpu.data.flyingthings import FlyingThingsDataset

    root = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
        else "/tmp/flt_synth"
    N = int(sys.argv[sys.argv.index("--N") + 1]) if "--N" in sys.argv else 768
    crop = tuple(int(x) for x in
                 (sys.argv[sys.argv.index("--crop") + 1].split(",")
                  if "--crop" in sys.argv else (368, 496)))

    # stage microbench at raw FlyingThings frame size
    S, H, W = 8, 540, 960
    rgbs = [(np.random.rand(H, W, 3) * 255).astype(np.uint8) for _ in range(S)]
    trajs = (np.random.rand(S, N, 2) * [W, H]).astype(np.float32)
    vis = np.ones((S, N), np.float32)
    occs = [(np.random.rand(H, W) * 255).astype(np.float32) for _ in range(S)]
    masks = [np.random.rand(H, W).astype(np.float32) for _ in range(S)]

    print(f"-- aug stages at {H}x{W} S={S} N={N} (min of 3, single core) --")
    print(f"color_jitter x{S}: "
          f"{bench_stage(lambda r: [augs.color_jitter(x, r) for x in rgbs]):.3f}s")
    print(f"eraser_aug      : "
          f"{bench_stage(lambda r: augs.eraser_aug([x.copy() for x in rgbs], trajs.copy(), vis.copy(), r)):.3f}s")
    print(f"replace_aug     : "
          f"{bench_stage(lambda r: augs.replace_aug([x.copy() for x in rgbs], trajs.copy(), vis.copy(), r)):.3f}s")
    print(f"photometric     : "
          f"{bench_stage(lambda r: augs.photometric_augs([x.copy() for x in rgbs], trajs.copy(), vis.copy(), r)):.3f}s")
    print(f"spatial         : "
          f"{bench_stage(lambda r: augs.spatial_augs([x.astype(np.float32) for x in rgbs], [o.copy() for o in occs], [m.copy() for m in masks], trajs.copy(), vis, r, crop)):.3f}s")

    ds = FlyingThingsDataset(root, dset="TRAIN", subset="all", use_augs=True,
                             S=S, N=N, crop_size=crop)
    times = []
    for i in range(10):
        t0 = time.time()
        _, gotit = ds[i % len(ds)]
        times.append(time.time() - t0)
        assert gotit, f"sample {i} failed"
    print(f"-- end-to-end ds[i] with full augs (N={N}, crop={crop}) --")
    print("times:", " ".join(f"{t:.2f}" for t in times))
    print(f"warm min: {min(times[3:]):.3f}s  "
          f"({1.0 / min(times[3:]):.2f} samples/s/core)")


if __name__ == "__main__":
    main()
