"""Compare host-scheduled vs on-device chaining on a long synthetic video.

Run from repo root: python tools/profile_chain.py [--frames 64] [--points 256]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

from pips_tpu.data import SyntheticPointDataset  # noqa: E402
from pips_tpu.inference import ChainTracker, ChainTrackerOnDevice  # noqa: E402
from pips_tpu.models import Pips  # noqa: E402


def main():
    T = int(sys.argv[sys.argv.index("--frames") + 1]) if "--frames" in sys.argv else 64
    N = int(sys.argv[sys.argv.index("--points") + 1]) if "--points" in sys.argv else 256
    H, W = 360, 640

    ds = SyntheticPointDataset(S=T, N=N, H=H, W=W, num_sprites=6, seed=7)
    sample, _ = ds[0]
    rgbs = sample["rgbs"]
    xys = sample["trajs"][0].astype(np.float32)

    import jax.numpy as jnp
    bf16 = "--bf16" in sys.argv
    model = Pips(S=8, stride=8, dtype=jnp.bfloat16 if bf16 else None,
                 fuse_chanff=bf16)
    params = model.init(jax.random.PRNGKey(0), xys[None, :8],
                        rgbs[None, :8, :64, :64], iters=1)

    host = ChainTracker(model, params, iters=6, capacity=N)
    t0 = time.time()
    ht, hv = host.track_video(rgbs, xys)     # includes compiles
    t_host_cold = time.time() - t0
    t0 = time.time()
    ht, hv = host.track_video(rgbs, xys)
    t_host = time.time() - t0

    dev = ChainTrackerOnDevice(model, params, iters=6)
    t0 = time.time()
    dt_, dv_ = dev.track_video(rgbs, xys)
    t_dev_cold = time.time() - t0
    t0 = time.time()
    dt_, dv_ = dev.track_video(rgbs, xys)
    t_dev = time.time() - t0

    print(f"video T={T} N={N} {H}x{W}")
    print(f"host-scheduled : {t_host:.2f}s warm ({t_host_cold:.1f}s cold) "
          f"-> {N * T / t_host:.0f} points*frames/sec")
    print(f"on-device      : {t_dev:.2f}s warm ({t_dev_cold:.1f}s cold) "
          f"-> {N * T / t_dev:.0f} points*frames/sec")
    agree = np.abs(dt_ - ht).max()
    print(f"max traj difference host vs device: {agree:.3f}px "
          f"(skip decisions may diverge under fp noise)")


if __name__ == "__main__":
    main()
