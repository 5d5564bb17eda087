"""Device mesh + sharding (the subsystem the reference lacks — its only
parallelism is single-process ``torch.nn.DataParallel``, ``train.py:254``).

TPU-native stance (SURVEY §2f): a 2D mesh ("data", "point"):
  * batch B shards over "data" (classic DP; gradient psum over ICI),
  * query points N shard over "point" — points are independent by
    construction, so N is the natural "sequence-parallel" axis for this
    model family; dense-grid eval (thousands of points per frame) scales
    linearly across chips with zero cross-point communication.

Params are replicated (the model is ~29M params — far below HBM; TP/PP are
deliberately not used, SURVEY §2f). Multi-host runs get DCN handling for free
from ``jax.distributed.initialize`` + the same mesh.

Everything compiles through ``jax.jit`` with NamedShardings; XLA inserts the
collectives (psum for grads and masked-mean reductions).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
import optax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
POINT_AXIS = "point"


def default_mesh_shape(ndev: int, B: int, N: int) -> tuple[int, int]:
    """Largest (data, point) mesh whose axes divide the batch/point dims.

    Prefers data parallelism, then spends leftover devices on the point
    axis (e.g. 8 devices, B=4, N=768 -> (4, 2); B=1, N=16 -> (1, 8)).
    """
    import math
    d = math.gcd(B, ndev)
    p = math.gcd(N, ndev // d)
    return (d, p)


def make_mesh(shape: Optional[Sequence[int]] = None,
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    """Mesh over (data, point). Default: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    n = int(np.prod(shape))
    assert n <= len(devices), (shape, len(devices))
    dev_array = mesh_utils.create_device_mesh(tuple(shape), devices=devices[:n])
    return Mesh(dev_array, (DATA_AXIS, POINT_AXIS))


def distributed_init(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host entry: join the JAX distributed runtime.

    On TPU pod slices all arguments are auto-detected from the environment;
    pass them explicitly for manual launches (e.g. the 2-process CPU test).
    Safe to call once per process, before any other JAX call; a repeat call
    (e.g. ``train()`` invoked from a process that already joined) is a no-op.
    """
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes:
        kwargs["num_processes"] = num_processes
    if process_id is not None and process_id >= 0:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_hybrid_mesh(ici_shape: Sequence[int],
                     dcn_data: Optional[int] = None) -> Mesh:
    """Multi-host mesh: the data axis spans DCN (one slice per host group),
    the point axis stays inside each slice's ICI domain.

    ici_shape: per-slice (data, point) shape; dcn_data: number of slices on
    the data axis (default: ``jax.process_count()``). Gradient psums ride
    DCN only on the replicated-param reduction; point-axis collectives stay
    on ICI — the layout SURVEY §2f calls for.
    """
    dcn_data = dcn_data or jax.process_count()
    # granule = what a "DCN island" is: TPU multi-slice jobs expose
    # slice_index; single-slice multi-host (and the CPU test harness)
    # group by process instead
    slices = {getattr(d, "slice_index", 0) for d in jax.devices()}
    by_process = len(slices) != dcn_data
    dev_array = mesh_utils.create_hybrid_device_mesh(
        tuple(ici_shape), (dcn_data, 1), process_is_granule=by_process)
    return Mesh(dev_array, (DATA_AXIS, POINT_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def parse_mesh_arg(arg: str) -> Optional[Mesh]:
    """CLI ``--mesh`` string -> Mesh (eval runners / chain engines).

    "" -> None (single-device path, no mesh); "auto" -> all devices on the
    point axis (the right layout for inference: every chip tracks a slice
    of the points); "D,P" -> explicit (data, point) shape, e.g. "1,8".
    """
    if not arg:
        return None
    if arg == "auto":
        return make_mesh((1, len(jax.devices())))
    shape = tuple(int(v) for v in arg.strip("()[] ").split(",") if v)
    assert len(shape) == 2, f"--mesh wants 'D,P', got {arg!r}"
    return make_mesh(shape)


def batch_pspecs(grad_acc: int = 1) -> dict[str, P]:
    """PartitionSpecs for a train batch: B on data, N on point."""
    lead = (None,) * (1 if grad_acc > 1 else 0)
    return {
        "rgbs": P(*lead, DATA_AXIS),
        "trajs": P(*lead, DATA_AXIS, None, POINT_AXIS),
        "visibles": P(*lead, DATA_AXIS, None, POINT_AXIS),
        "valids": P(*lead, DATA_AXIS, None, POINT_AXIS),
    }


def shard_batch(mesh: Mesh, batch: dict, grad_acc: int = 1) -> dict:
    """Place a host batch on the mesh. Single-process: a sharded device_put.
    Multi-process: each host contributes its process-local slice of the
    global batch (``jax.make_array_from_process_local_data``), so every host
    loads only the data its own devices consume."""
    specs = batch_pspecs(grad_acc)
    # keep only what the train step consumes: datasets may carry host-side
    # extras (FlyingThings' occs/masks feed summaries, not the step) and
    # transferring them over the tunnel every step is pure waste
    batch = {k: v for k, v in batch.items() if k in specs}
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(
                    NamedSharding(mesh, specs[k]), v)
                for k, v in batch.items()}
    return {k: jax.device_put(v, NamedSharding(mesh, specs[k])) for k, v in batch.items()}


def make_sharded_train_step(model, tx: optax.GradientTransformation, mesh: Mesh,
                            iters: int = 4, horz_flip: bool = True,
                            vert_flip: bool = True, grad_acc: int = 1,
                            use_fused_corr: bool = False, remat: bool = False,
                            donate_state: bool = True):
    """jit the train step over the mesh: replicated state, sharded batch."""
    from pips_tpu.train.step import make_train_step

    step = make_train_step(model, tx, iters=iters, horz_flip=horz_flip,
                           vert_flip=vert_flip, grad_acc=grad_acc,
                           use_fused_corr=use_fused_corr, remat=remat)
    rep = replicate(mesh)
    batch_sh = {k: NamedSharding(mesh, spec) for k, spec in batch_pspecs(grad_acc).items()}
    return jax.jit(
        step,
        in_shardings=(rep, batch_sh),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )


def make_sharded_forward(model, mesh: Mesh, iters: int = 6,
                         corr_mode: str = "onehot"):
    """jit eval-mode forward with points sharded over the full mesh.

    For inference we fold both mesh axes over N (and replicate the video):
    every chip tracks a slice of the points through the same frames.
    """
    rep = replicate(mesh)
    point_sh = NamedSharding(mesh, P(None, (DATA_AXIS, POINT_AXIS), None))

    def fwd(params, xys, rgbs):
        out = model.apply(params, xys, rgbs, iters=iters, is_train=False,
                          corr_mode=corr_mode)
        return out.coord_predictions[-1], out.vis_e, out.ffeat

    return jax.jit(fwd, in_shardings=(rep, point_sh, rep),
                   out_shardings=(rep, rep, rep))
