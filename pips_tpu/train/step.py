"""The jitted training step (capability parity: reference ``train.py:32-144,291-356``).

One compiled function per config: flip-based batch doubling (in-graph),
forward with score maps, loss = seq + 10*vis + ce, ATE metrics,
gradient accumulation via ``lax.scan`` (summing grads, matching torch's
``backward()`` accumulation), clip + AdamW update.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from pips_tpu.models.losses import balanced_ce_loss, sequence_loss
from pips_tpu.ops.reduce import reduce_masked_mean


class TrainState(train_state.TrainState):
    pass


Batch = Dict[str, jnp.ndarray]


def apply_flip_doubling(batch: Batch, horz_flip: bool, vert_flip: bool) -> Batch:
    """Reference ``train.py:49-79``: concat flipped copies along batch.

    horz then vert => B*4 (the vert flip also flips the horz copies).
    """
    def flip(b: Batch, axis: int, coord: int, size: int) -> Batch:
        out = dict(b)
        out["rgbs"] = jnp.flip(b["rgbs"], axis=axis)
        trajs = b["trajs"]
        out["trajs"] = trajs.at[..., coord].set(size - 1 - trajs[..., coord])
        return out

    def cat(a: Batch, b: Batch) -> Batch:
        return {k: jnp.concatenate([a[k], b[k]], axis=0) for k in a}

    H, W = batch["rgbs"].shape[2], batch["rgbs"].shape[3]
    if horz_flip:
        batch = cat(batch, flip(batch, axis=3, coord=0, size=W))
    if vert_flip:
        batch = cat(batch, flip(batch, axis=2, coord=1, size=H))
    return batch


def train_loss_fn(model, params, batch: Batch, iters: int, is_train: bool = True,
                  use_fused_corr: bool = False):
    """Returns (total_loss, metrics). batch keys: rgbs (B,S,H,W,3) uint8-range
    float, trajs (B,S,N,2), visibles (B,S,N), valids (B,S,N)."""
    rgbs = batch["rgbs"]
    trajs_g = batch["trajs"]
    vis_g = batch["visibles"]
    valids = batch["valids"]

    # ce_gt triggers in-loop CE accumulation: the (B,S,I,N,H8,W8) score-map
    # stack is never materialized (equal to the stacked loss — see
    # losses.score_map_loss_single_iter)
    out = model.apply(params, trajs_g[:, 0], rgbs, iters=iters, is_train=is_train,
                      compute_fcp=True, use_fused_corr=use_fused_corr,
                      ce_gt=(trajs_g, vis_g, valids))

    seq_loss = sequence_loss(out.coord_predictions, trajs_g, vis_g, valids, 0.8)
    vis_loss, _ = balanced_ce_loss(out.vis_e, vis_g, valids)
    # PIPs++ (Pips2) has no score-map CE term (reference train2.py:81);
    # its output carries ce_loss=None
    ce_loss = out.ce_loss if out.ce_loss is not None else jnp.float32(0.0)
    total_loss = seq_loss + vis_loss * 10.0 + ce_loss

    ate = jnp.linalg.norm(out.coord_predictions[-1] - trajs_g, axis=-1)  # B,S,N
    metrics = {
        "total_loss": total_loss,
        "seq": seq_loss,
        "vis": vis_loss,
        "ce": ce_loss,
        "ate_all": reduce_masked_mean(ate, valids),
        "ate_vis": reduce_masked_mean(ate, valids * vis_g),
        "ate_occ": reduce_masked_mean(ate, valids * (1.0 - vis_g)),
    }
    return total_loss, metrics


def make_train_step(model, tx: optax.GradientTransformation, iters: int = 4,
                    horz_flip: bool = True, vert_flip: bool = True,
                    grad_acc: int = 1, use_fused_corr: bool = False,
                    remat: bool = False) -> Callable[[TrainState, Batch], Any]:
    """Build the (un-jitted) train step; jit/shard it via ``pips_tpu.parallel``.

    With ``grad_acc > 1`` the batch must have a leading (grad_acc,) microbatch
    axis; grads are summed across microbatches (torch-style accumulation).
    ``remat=True`` rematerializes the forward during backward (trade FLOPs for
    HBM; useful at large B*N with score-map loss active).
    """

    def loss_for_grad(params, microbatch: Batch):
        microbatch = apply_flip_doubling(microbatch, horz_flip, vert_flip)
        return train_loss_fn(model, params, microbatch, iters,
                             use_fused_corr=use_fused_corr)

    if remat:
        loss_for_grad = jax.checkpoint(loss_for_grad)
    grad_fn = jax.value_and_grad(loss_for_grad, has_aux=True)

    def step(state: TrainState, batch: Batch):
        if grad_acc == 1:
            (_, metrics), grads = grad_fn(state.params, batch)
        else:
            def scan_body(carry, microbatch):
                (_, metrics), grads = grad_fn(state.params, microbatch)
                carry = jax.tree.map(jnp.add, carry, grads)
                return carry, metrics

            zero = jax.tree.map(jnp.zeros_like, state.params)
            grads, metrics_seq = jax.lax.scan(scan_body, zero, batch)
            # Mean over microbatches: the logged step metric covers the FULL
            # effective batch (equal-size microbatches), matching the
            # reference's full-batch metrics — not a 1/grad_acc sample.
            metrics = jax.tree.map(lambda m: m.mean(axis=0), metrics_seq)
        new_state = state.apply_gradients(grads=grads)
        return new_state, metrics

    return step
