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


def load_dino_state_dict(init_dir: str) -> dict:
    """DINO ViT torch state_dict as numpy arrays, from a local ``.pth`` (or
    torch.hub when ``init_dir`` is missing — the reference's path,
    ``test_on_flt.py:245-248``; needs network access)."""
    import torch

    if init_dir and os.path.exists(init_dir):
        sd = torch.load(init_dir, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
    else:
        try:
            sd = torch.hub.load("facebookresearch/dino:main",
                                "dino_vits8").state_dict()
        except Exception as e:
            raise FileNotFoundError(
                f"dino checkpoint {init_dir!r} not found and torch.hub fetch "
                f"failed ({e}); download dino_deitsmall8_pretrain.pth from "
                "the DINO release and pass --init_dir <path>") from e
    return {k: np.asarray(v.numpy() if hasattr(v, "numpy") else v)
            for k, v in sd.items()}


def infer_dino_arch(sd: dict) -> tuple[int, int, int, int]:
    """(dim, depth, heads, patch) from a DINO ViT state dict (heads via the
    64-dim-per-head ViT convention: S/8 -> 6, B/8 -> 12)."""
    dim = int(sd["cls_token"].shape[-1])
    depth = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    patch = int(sd["patch_embed.proj.weight"].shape[-1])
    return dim, depth, max(dim // 64, 1), patch


def build_baseline_tracker(modeltype: str, init_dir: str, raft_iters: int = 32):
    """Baseline tracker shared by the FLT/BADJA/CroHD eval runners
    (reference runs raft and dino on every benchmark: ``test_on_flt.py:123-161``,
    ``test_on_badja.py:161-539``, ``test_on_crohd.py:65-222``).

    Returns ``fn(xys (1,N,2), rgbs (1,T,H,W,3) [0,255]) -> trajs_e (1,T,N,2)``
    for arbitrary T (full-video for BADJA, S-frame windows for FLT/CroHD).
    """
    if modeltype == "raft":
        import torch

        from pips_tpu.inference.flow_chain import FlowChainTracker
        from pips_tpu.models.raft import Raftnet
        from pips_tpu.torchport.convert import convert_raft_state_dict

        sd = torch.load(init_dir, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model_state_dict" in sd:
            sd = sd["model_state_dict"]
        variables = convert_raft_state_dict(
            {k: np.asarray(v.numpy() if hasattr(v, "numpy") else v)
             for k, v in sd.items()})
        net = Raftnet(variables, iters=raft_iters)
        tracker = FlowChainTracker(net.forward)
        return lambda xys, rgbs: tracker.track(np.asarray(rgbs),
                                               np.asarray(xys, np.float32))

    if modeltype == "dino":
        from pips_tpu.models.dino import DinoTracker
        from pips_tpu.torchport.convert import convert_dino_vit_state_dict

        sd = load_dino_state_dict(init_dir)
        dim, depth, heads, patch = infer_dino_arch(sd)
        trackers: dict = {}  # pos-embed interpolation is per patch-grid shape

        def track(xys, rgbs):
            H, W = rgbs.shape[2:4]
            if H % patch or W % patch:
                raise ValueError(f"dino needs H,W divisible by {patch}, "
                                 f"got {(H, W)}")
            key = (H // patch, W // patch)
            if key not in trackers:
                variables = convert_dino_vit_state_dict(
                    sd, grid_hw=key, dim=dim, heads=heads, depth=depth)
                trackers[key] = DinoTracker(
                    DinoTracker.make_vit_feat_fn(variables, patch, dim=dim,
                                                 depth=depth, heads=heads),
                    patch_size=patch)
            return trackers[key].track(np.asarray(rgbs[0]),
                                       np.asarray(xys[0], np.float32))[None]

        return track

    raise ValueError(f"unknown baseline modeltype {modeltype!r}")


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


def build_pips_tracker(init_dir: str, S: int, stride: int, iters: int,
                       dtype: str = "float32", corr_mode: str = "onehot"):
    """Fixed-window PIPs tracker: fn(xys (1,N,2), rgbs (1,S,H,W,3)) ->
    trajs_e (1,S,N,2). The shared pips branch of every eval runner."""
    import jax.numpy as jnp

    model = make_pips(S=S, stride=stride, dtype=dtype)
    params = load_params(model, init_dir)

    @jax.jit
    def fwd(xys, rgbs):
        out = model.apply(params, xys, rgbs, iters=iters, is_train=False,
                          corr_mode=corr_mode)
        return out.coord_predictions[-1]

    return lambda xys, rgbs: np.asarray(fwd(jnp.asarray(xys), jnp.asarray(rgbs)))


def emit_eval_media(writer, step: int, rgbs: np.ndarray, trajs_g: np.ndarray,
                    trajs_e: np.ndarray, valids: np.ndarray, ate: float,
                    fps: int = 8) -> None:
    """The reference eval scripts' media pair (``test_on_flt.py:58,106``,
    ``test_on_crohd.py:102,152``): gt trajs in 'winter' on the time-mean
    frame with the ATE stamped top-left, plus the estimated trajs as a
    per-frame 'spring' gif. rgbs (S,H,W,3) float 0..255; trajs (S,N,2);
    valids (S,N)."""
    from pips_tpu.utils.improc import Summ_writer, preprocess_color

    sw = Summ_writer(writer, global_step=step, log_freq=1, fps=fps)
    rgb_mean = preprocess_color(rgbs.mean(axis=0))
    sw.summ_traj2ds_on_rgb("inputs_0_all/single_trajs_on_rgb", trajs_g,
                           rgb_mean, valids=valids, cmap="winter",
                           linewidth=2, frame_id=ate)
    sw.summ_traj2ds_on_rgbs("outputs/trajs_on_rgbs", trajs_e,
                            preprocess_color(rgbs), cmap="spring",
                            linewidth=2)
