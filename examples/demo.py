"""Single-window demo (capability parity: reference ``demo.py``).

Reads jpg frames, resizes to 360x640, tracks a 16x16 query grid through each
8-frame chunk, writes trajectory GIFs.

    python examples/demo.py --init_dir <ckpt> --images_dir ./demo_images
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from pips_tpu.evals.common import load_params, resize_video_half_pixel
from pips_tpu.inference.window import WindowTracker, grid_queries
from pips_tpu.models import Pips
from pips_tpu.utils.improc import draw_trajs_on_rgbs, write_gif


def main(init_dir: str = "checkpoints/ref", images_dir: str = "./demo_images",
         out_dir: str = "./demo_out", S: int = 8, stride: int = 4, iters: int = 6,
         resize_hw=(360, 640), grid: int = 16, max_chunks: int = 0,
         bf16: bool = False):
    import imageio.v2 as imageio

    filenames = sorted(glob.glob(os.path.join(images_dir, "*.jpg")))
    if not filenames:
        raise FileNotFoundError(f"no jpgs in {images_dir}")
    print(f"found {len(filenames)} frames")

    import jax.numpy as jnp
    from pips_tpu.evals.common import make_pips
    model = make_pips(S=S, stride=stride,
                  dtype="bfloat16" if bf16 else "float32")
    params = load_params(model, init_dir)
    tracker = WindowTracker(model, params, iters=iters)

    H_, W_ = resize_hw
    xys = grid_queries(H_, W_, grid, grid)  # (1, grid*grid, 2)

    os.makedirs(out_dir, exist_ok=True)
    n_chunks = len(filenames) // S
    if max_chunks:
        n_chunks = min(n_chunks, max_chunks)
    for ci in range(n_chunks):
        frames = [imageio.imread(f) for f in filenames[ci * S:(ci + 1) * S]]
        rgbs = resize_video_half_pixel(np.stack(frames).astype(np.float32), (H_, W_))

        t0 = time.time()
        trajs, vis = tracker(xys, rgbs[None])
        print(f"chunk {ci}: {time.time() - t0:.2f}s")

        vis_frames = draw_trajs_on_rgbs(rgbs.astype(np.uint8), trajs[0],
                                        cmap="spring", linewidth=2)
        out_fn = os.path.join(out_dir, f"demo_chunk{ci:03d}.gif")
        write_gif(out_fn, list(vis_frames), fps=8)
        print(f"saved {out_fn}")


if __name__ == "__main__":
    from pips_tpu.utils.cli import auto_cli
    auto_cli(main)
