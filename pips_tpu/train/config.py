"""Training configuration (schema parity: reference ``train.py:146-182``).

A dataclass is the config; a tiny fire-like CLI maps ``--key value`` /
``--key=value`` onto fields with type coercion, so
``python -m pips_tpu.train --B 4 --lr 5e-4`` works like the reference's
``python train.py --B=4 --lr=5e-4``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Sequence


@dataclass
class TrainConfig:
    exp_name: str = "debug"
    # training
    B: int = 4
    S: int = 8
    N: int = 768
    horz_flip: bool = True
    vert_flip: bool = True
    stride: int = 8
    I: int = 4
    # model dims (defaults = reference hyps, nets/pips.py:407-410)
    latent_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 3
    mixer_dim: int = 512
    mixer_depth: int = 12
    crop_size: Sequence[int] = (384, 512)
    use_augs: bool = True
    # dataset
    dataset: str = "flyingthings"   # flyingthings | pointodyssey | synthetic
    dataset_location: str = "/data/flyingthings"
    subset: str = "all"
    shuffle: bool = True
    # optimization
    lr: float = 5e-4
    wdecay: float = 1e-4
    grad_acc: int = 1
    max_iters: int = 200000
    use_scheduler: bool = True
    # summaries
    log_dir: str = "logs_train"
    log_freq: int = 4000
    log_media: bool = True   # emit traj GIF + score-map render every log_freq
    model_family: str = "pips"  # "pips" (fixed-S mixer, train.py) or
                                # "pips2" (S-agnostic PIPs++, train2.py intent)
    num_workers: int = 8   # host loader threads (reference train.py:228
                           # used 16 *processes* per GPU)
    loader_processes: bool = False  # spawn worker PROCESSES instead of
                                    # threads (decode/augs are partly
                                    # GIL-bound; processes scale with cores)
    metrics_every: int = 10  # host-sync metrics every K steps (device_get is
                             # a round-trip; the reference syncs every step)
    profile_dir: str = ""    # capture a jax.profiler trace of steps 10-15
    val_freq: int = 2000
    val_batches: int = 8   # batches per validation pass (pooled, n=10000)
    # saving/loading
    ckpt_dir: str = "checkpoints"
    save_freq: int = 1000
    keep_latest: int = 1
    init_dir: str = ""
    auto_resume: bool = True  # resume from this run's own latest checkpoint
                              # (full state + step) when one exists and no
                              # explicit init_dir is given
    load_optimizer: bool = False
    load_step: bool = False
    ignore_load: Optional[str] = None
    # device
    mesh_shape: Optional[Sequence[int]] = None  # e.g. (8,) data-parallel; None = all devices
    # multi-host: set multihost=true on every process of a pod slice (args
    # auto-detected on TPU; pass coordinator/num_processes/process_id for
    # manual launches). B is PER-HOST; the data axis spans hosts over DCN,
    # the point axis stays on ICI (parallel/mesh.py:make_hybrid_mesh).
    multihost: bool = False
    coordinator: str = ""
    num_processes: int = 0
    process_id: int = -1
    dtype: str = "bfloat16"   # compute dtype for the model ("float32" for exactness)
    use_fused_corr: bool = False
    # remats: since the fused-fcp rewrite the production config (4hv N=768
    # I=4 368x496 bf16) fits one v5e chip with NO remat (437 ms/step vs
    # 559 ms all-remat; compile 42 s vs 407 s) — defaults off; enable for
    # configs that exceed HBM (bigger crops / B / N per chip)
    remat: bool = False        # whole-step remat (heavy on the compiler)
    remat_mixer: bool = False  # surgical DeltaBlock remat
    remat_corr: bool = False   # recompute corr volumes on backward
    remat_encoder: bool = False  # per-block encoder remat
    fuse_chanff: int = -1  # fused Pallas channel-FF mixer blocks:
                           # -1 auto (on iff TPU backend + bf16), 0 off, 1 on
                           # (CPU runs would need pallas interpret mode)
    fuse_conv3: int = 0    # fused implicit-im2col Pallas kernel for the
                           # encoder's stage-1 3x3 convs: same -1/0/1
                           # semantics as fuse_chanff, but default OFF —
                           # standalone it trails XLA's conv (see
                           # kernels/conv_pallas.py); enable per-run to
                           # probe layout side-effects
    # smoke mode (reference train2.py --quick analog)
    quick: bool = False

    def model_name(self) -> str:
        """Descriptive run name (reference ``train.py:190-212``)."""
        eff_b = self.B * (2 if self.horz_flip else 1) * (2 if self.vert_flip else 1)
        name = f"{eff_b}"
        if self.horz_flip and self.vert_flip:
            name = f"{self.B * 4}hv"
        elif self.horz_flip:
            name = f"{self.B * 2}h"
        elif self.vert_flip:
            name = f"{self.B * 2}v"
        if self.grad_acc > 1:
            name += f"x{self.grad_acc}"
        name += f"_{self.S}_{self.N}_I{self.I}"
        lrn = f"{self.lr:.1e}"
        name += "_" + lrn[0] + lrn[3:5].lstrip("0") + lrn[-1]
        if self.use_augs:
            name += "_A"
        return name + f"_{self.exp_name}"


def _coerce(value: str, typ):
    if typ is bool or typ == "bool":
        return value.lower() in ("1", "true", "yes", "y")
    if typ is int:
        return int(value)
    if typ is float:
        return float(value)
    if typ is tuple:
        return tuple(int(v) for v in value.strip("()[] ").split(",") if v)
    return value


def parse_cli(argv: Sequence[str], cfg: Optional[TrainConfig] = None) -> TrainConfig:
    """Parse ``--key value`` / ``--key=value`` pairs onto TrainConfig fields."""
    cfg = cfg or TrainConfig()
    fields = {f.name: f for f in dataclasses.fields(TrainConfig)}
    updates = {}
    i = 0
    argv = list(argv)
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--"):
            raise SystemExit(f"unexpected argument: {arg}")
        key = arg[2:]
        if "=" in key:
            key, value = key.split("=", 1)
        else:
            if i + 1 < len(argv) and not argv[i + 1].startswith("--"):
                value = argv[i + 1]
                i += 1
            else:
                value = "true"  # bare flag
        key = key.replace("-", "_")
        if key not in fields:
            raise SystemExit(f"unknown config field: --{key}; valid: {sorted(fields)}")
        f = fields[key]
        typ = f.type if f.type is not None else str
        if isinstance(typ, str):  # `from __future__ import annotations` strings
            base = typ.split("[")[0].strip()
            if base == "Optional":
                base = typ.split("[", 1)[1].rstrip("]").split("[")[0].strip()
            typ = {"int": int, "float": float, "bool": bool, "str": str,
                   "Sequence": tuple, "tuple": tuple, "list": tuple}.get(base, str)
        updates[key] = _coerce(value, typ)
        i += 1
    return dataclasses.replace(cfg, **updates)
