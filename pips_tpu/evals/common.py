"""Shared eval-runner utilities: weight loading (native or torch checkpoints)
and host-side half-pixel resizing matching the reference eval scripts'
``F.interpolate(mode='bilinear'/'nearest')`` preprocessing."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax

from pips_tpu.models import Pips


def make_pips(S: int = 8, stride: int = 8, dtype: str = "float32") -> Pips:
    """Eval/serving model factory. ``--dtype bfloat16`` runs the bf16 compute
    path (fused mixer kernel auto-enabled on TPU, ~1.6x faster windows);
    default float32 keeps exact metric parity with the reference evals."""
    import jax.numpy as jnp

    from pips_tpu.utils.compcache import maybe_enable_compilation_cache
    maybe_enable_compilation_cache()

    from pips_tpu.kernels import fused_kernels_supported

    dt = jnp.bfloat16 if dtype in ("bfloat16", "bf16") else None
    fuse = dt is not None and fused_kernels_supported()
    return Pips(S=S, stride=stride, dtype=dt, fuse_chanff=fuse)


def load_params(model: Pips, init_dir: str, example_hw=(64, 96)):
    """Load params from a pips_tpu checkpoint dir, a reference ``model-*.pth``
    file/dir (via the torch port), or ``"random"`` for a fresh init (smoke
    runs); raises with guidance otherwise."""
    import glob

    import jax.numpy as jnp

    from pips_tpu.utils import saverloader

    if init_dir == "random":
        H, W = example_hw
        rgbs = jnp.zeros((1, model.S, H, W, 3))
        xys = jnp.ones((1, 4, 2))
        print("warning: using randomly initialized weights (smoke mode)")
        return model.init(jax.random.PRNGKey(0), xys, rgbs, iters=1)

    if os.path.isdir(init_dir) and saverloader.list_steps(init_dir):
        # Accept either a bare variables checkpoint ({"params": ...}) or a
        # full TrainState checkpoint ({"step", "params", "opt_state"}, where
        # "params" holds the variables dict) as written by the train loop —
        # eval only needs the params sub-tree.
        raw, step = saverloader.load_raw(init_dir)
        variables = raw["params"] if {"opt_state", "step"} <= set(raw) else raw
        if "params" not in variables:
            raise ValueError(
                f"checkpoint in {init_dir} has no 'params' sub-tree "
                f"(top-level keys: {sorted(raw)})")
        H, W = example_hw
        rgbs = jnp.zeros((1, model.S, H, W, 3))
        xys = jnp.ones((1, 4, 2))
        target = model.init(jax.random.PRNGKey(0), xys, rgbs, iters=1)
        from flax import serialization
        params = serialization.from_state_dict(target, variables)
        print(f"loaded pips_tpu checkpoint at step {step} from {init_dir}")
        return params

    pths = []
    if os.path.isfile(init_dir) and init_dir.endswith(".pth"):
        pths = [init_dir]
    elif os.path.isdir(init_dir):
        pths = sorted(glob.glob(os.path.join(init_dir, "*.pth")))
    if pths:
        from pips_tpu.torchport import load_torch_checkpoint
        print(f"porting torch checkpoint {pths[-1]}")
        return {"params": load_torch_checkpoint(pths[-1], mixer_depth=model.mixer_depth)}

    raise FileNotFoundError(
        f"no checkpoint found at {init_dir} (expected model-*.msgpack or model-*.pth)")


def resize_video_half_pixel(rgbs: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """(S, H, W, C) bilinear resize with half-pixel centers (torch
    ``F.interpolate(mode='bilinear', align_corners=False)`` semantics, as used
    by the eval scripts' preprocessing, e.g. ``test_on_badja.py:50``)."""
    import jax.image

    S, H, W, C = rgbs.shape
    out = jax.image.resize(rgbs, (S, out_hw[0], out_hw[1], C), method="linear")
    return np.asarray(out)


def resize_video_nearest(x: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """(S, H, W) nearest resize (torch ``F.interpolate(mode='nearest')``)."""
    S, H, W = x.shape
    ys = (np.arange(out_hw[0]) * H / out_hw[0]).astype(np.int64)
    xs = (np.arange(out_hw[1]) * W / out_hw[1]).astype(np.int64)
    return x[:, ys][:, :, xs]
