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


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


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
    specs = batch_pspecs(grad_acc)
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
