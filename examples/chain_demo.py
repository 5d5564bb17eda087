"""Long-video chaining demo (capability parity: reference ``chain_demo.py``).

Tracks query points through an arbitrarily long jpg sequence via
visibility-aware window chaining — batched across points on the TPU (the
reference loops points sequentially; see ``pips_tpu.inference.chain``).

    python examples/chain_demo.py --init_dir <ckpt> --images_dir ./demo_images
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from pips_tpu.evals.common import load_params, resize_video_half_pixel
from pips_tpu.inference import ChainTracker
from pips_tpu.models import Pips
from pips_tpu.utils.improc import draw_trajs_on_rgbs, write_gif


def main(init_dir: str = "checkpoints/ref", images_dir: str = "./demo_images",
         out_dir: str = "./chain_out", S: int = 8, stride: int = 4, iters: int = 6,
         resize_hw=(360, 640), x0: float = 450.0, y0: float = 100.0, N: int = 1,
         grid: int = 0, max_frames: int = 0, on_device: bool = False,
         bf16: bool = False, stream: bool = False):
    import imageio.v2 as imageio

    filenames = sorted(glob.glob(os.path.join(images_dir, "*.jpg")))
    if max_frames:
        filenames = filenames[:max_frames]
    if not filenames:
        raise FileNotFoundError(f"no jpgs in {images_dir}")
    T = len(filenames)
    print(f"tracking through {T} frames")

    H_, W_ = resize_hw

    def _decode(fn):
        return resize_video_half_pixel(
            imageio.imread(fn)[None].astype(np.float32), (H_, W_))[0]

    rgbs = None
    if stream:
        # double-buffered feed: jpg decode+resize on a background thread
        # overlaps the device encode (north-star "TPU never stalls on
        # video I/O"); frames are re-decoded afterwards for the GIF only
        from pips_tpu.inference import FrameFeed
        video_in = FrameFeed([(lambda f=f: _decode(f)) for f in filenames],
                             chunk=S, depth=2)
    else:
        rgbs = np.stack([imageio.imread(f) for f in filenames]).astype(np.float32)
        rgbs = resize_video_half_pixel(rgbs, (H_, W_))
        video_in = rgbs

    if grid:
        from pips_tpu.inference.window import grid_queries
        xys = grid_queries(H_, W_, grid, grid)[0]
    else:
        xys = np.tile(np.array([[x0, y0]], np.float32), (N, 1))

    import jax.numpy as jnp
    from pips_tpu.evals.common import make_pips
    model = make_pips(S=S, stride=stride,
                  dtype="bfloat16" if bf16 else "float32")
    params = load_params(model, init_dir)
    if on_device:
        from pips_tpu.inference import ChainTrackerOnDevice
        chain = ChainTrackerOnDevice(model, params, iters=iters)
    else:
        chain = ChainTracker(model, params, iters=iters)

    t0 = time.time()
    if stream and not on_device:
        # fully online: windows refine as frames decode+encode, features
        # behind the earliest pending window are evicted (bounded HBM)
        trajs, vis = chain.track_stream(video_in, xys.astype(np.float32))
    else:
        trajs, vis = chain.track_video(video_in, xys.astype(np.float32))
    dt = time.time() - t0
    tag = " (decode streamed)" if stream else ""
    print(f"chained {len(xys)} points x {T} frames in {dt:.2f}s "
          f"({len(xys) * T / dt:.0f} points*frames/sec){tag}")

    if rgbs is None:
        rgbs = np.stack([_decode(f) for f in filenames])
    gray = np.mean(rgbs, axis=-1, keepdims=True).repeat(3, -1).astype(np.uint8)
    vis_frames = draw_trajs_on_rgbs(gray, trajs, visibles=vis, cmap="spring",
                                    linewidth=2)
    os.makedirs(out_dir, exist_ok=True)
    out_fn = os.path.join(out_dir, "chain_out.gif")
    write_gif(out_fn, list(vis_frames), fps=12)
    print(f"saved {out_fn}")


if __name__ == "__main__":
    from pips_tpu.utils.cli import auto_cli
    auto_cli(main)
