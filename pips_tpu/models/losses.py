"""Training losses (capability parity: reference ``nets/pips.py:14-90``).

All losses are fixed-shape and mask-based (no boolean indexing), so they jit
and shard cleanly: the reference's python loop building one-hot score-map
targets (``nets/pips.py:75-76``) becomes a broadcast iota comparison.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pips_tpu.ops.reduce import EPS, reduce_masked_mean


def balanced_ce_loss(pred: jnp.ndarray, gt: jnp.ndarray, valid: jnp.ndarray | None = None):
    """Pos/neg-balanced sigmoid BCE on logits.

    gt entries > 0.95 are positives, < 0.05 negatives; each side is masked-mean
    reduced separately and summed (reference ``nets/pips.py:14-37``).
    Returns (balanced_loss, elementwise_loss).
    """
    if valid is None:
        valid = jnp.ones_like(gt)
    pos = (gt > 0.95).astype(jnp.float32)
    neg = (gt < 0.05).astype(jnp.float32)

    label = pos * 2.0 - 1.0
    a = -label * pred
    b = jnp.maximum(a, 0.0)
    loss = b + jnp.log(jnp.exp(-b) + jnp.exp(a - b))

    pos_loss = reduce_masked_mean(loss, pos * valid)
    neg_loss = reduce_masked_mean(loss, neg * valid)
    return pos_loss + neg_loss, loss


def sequence_loss(flow_preds: jnp.ndarray, flow_gt: jnp.ndarray, vis: jnp.ndarray,
                  valids: jnp.ndarray, gamma: float = 0.8) -> jnp.ndarray:
    """γ-weighted L1 over refinement iterations.

    flow_preds: (I, B, S, N, 2) stacked per-iteration predictions;
    flow_gt: (B, S, N, 2); valids: (B, S, N).
    Parity with reference ``nets/pips.py:39-56`` (note: ``vis`` is accepted
    but unused there too).
    """
    I = flow_preds.shape[0]
    i_weights = gamma ** jnp.arange(I - 1, -1, -1, dtype=jnp.float32)  # gamma^(I-1-i)
    i_loss = jnp.mean(jnp.abs(flow_preds - flow_gt[None]), axis=-1)  # (I, B, S, N)
    per_iter = reduce_masked_mean(
        i_loss, jnp.broadcast_to(valids[None], i_loss.shape), axis=(1, 2, 3))  # (I,)
    return jnp.sum(per_iter * i_weights) / I


def score_map_loss_single_iter(fcp: jnp.ndarray, trajs_g: jnp.ndarray,
                               vis_g: jnp.ndarray, valids: jnp.ndarray) -> jnp.ndarray:
    """Balanced BCE for ONE iteration's score maps: fcp (B, S, N, H8, W8).

    The selection and one-hot masks are iteration-invariant, so the
    reference's joint mean over all iterations equals the average of
    per-iteration losses — computing per iteration inside the refinement
    loop avoids stacking (B, S, I, N, H8, W8) volumes (the reference's
    training memory hot spot).

    Fast separable form (numerically equal to ``score_map_loss`` on the
    single iteration, see ``tests/test_train.py::test_inloop_ce_matches
    _stacked``): since exactly one cell per selected map is positive,
      neg_sum(map) = sum softplus(z) - softplus(z[gt])
      pos(map)     = softplus(-z[gt])
    and ``z[gt]`` is contracted out with separable row/col one-hots — one
    fused pass over the volume instead of materializing the
    (B, S, N, H, W) one-hot + two full-volume masked means (that path was
    ~35% of the bf16 train step's HBM time).
    """
    B, S, N, H8, W8 = fcp.shape
    fcp = fcp.astype(jnp.float32)  # logits may arrive bf16 (mixed precision)
    xy = jnp.round(trajs_g)  # half-to-even, same as torch.round
    x = xy[..., 0]
    y = xy[..., 1]
    sel = ((x >= 0) & (x <= W8 - 1) & (y >= 0) & (y <= H8 - 1)
           & (valids > 0) & (vis_g > 0)).astype(jnp.float32)  # (B, S, N)

    oh_y = (jnp.arange(H8, dtype=jnp.float32) == y[..., None]).astype(jnp.float32)
    oh_x = (jnp.arange(W8, dtype=jnp.float32) == x[..., None]).astype(jnp.float32)

    sum_sp = jnp.sum(jax.nn.softplus(fcp), axis=(-2, -1))          # (B, S, N)
    gt_val = jnp.einsum("bsnhw,bsnh,bsnw->bsn", fcp, oh_y, oh_x)   # z[gt]

    pos = jax.nn.softplus(-gt_val)
    neg_sum = sum_sp - jax.nn.softplus(gt_val)

    n_sel = jnp.sum(sel)
    pos_loss = jnp.sum(pos * sel) / (EPS + n_sel)
    neg_loss = jnp.sum(neg_sum * sel) / (EPS + n_sel * (H8 * W8 - 1))
    return pos_loss + neg_loss


def score_map_loss(fcps: jnp.ndarray, trajs_g: jnp.ndarray, vis_g: jnp.ndarray,
                   valids: jnp.ndarray) -> jnp.ndarray:
    """Balanced BCE between corr score maps and one-hot gt positions.

    fcps: (B, S, I, N, H8, W8) logits; trajs_g: (B, S, N, 2) in *feature-map*
    (stride-divided) coords; vis_g, valids: (B, S, N).
    Parity with reference ``nets/pips.py:58-90``: heatmaps whose rounded gt
    position is out of bounds, occluded, or invalid are excluded; positives
    are the single gt cell, negatives all other cells of selected maps.
    """
    B, S, I, N, H8, W8 = fcps.shape
    fcps = fcps.astype(jnp.float32)  # logits may arrive bf16 (mixed precision)
    xy = jnp.round(trajs_g)  # half-to-even, same as torch.round
    x = xy[..., 0]
    y = xy[..., 1]
    sel = ((x >= 0) & (x <= W8 - 1) & (y >= 0) & (y <= H8 - 1)
           & (valids > 0) & (vis_g > 0)).astype(jnp.float32)  # (B, S, N)

    hh = jnp.arange(H8, dtype=jnp.float32).reshape(1, 1, 1, H8, 1)
    ww = jnp.arange(W8, dtype=jnp.float32).reshape(1, 1, 1, 1, W8)
    onehot = ((hh == y[..., None, None]) & (ww == x[..., None, None])).astype(jnp.float32)
    # (B, S, N, H8, W8) -> broadcast over I
    onehot = jnp.broadcast_to(onehot[:, :, None], (B, S, I, N, H8, W8))
    selb = jnp.broadcast_to(sel[:, :, None, :, None, None], (B, S, I, N, H8, W8))

    # elementwise balanced BCE with pos = onehot cells, neg = the rest,
    # both restricted to selected heatmaps
    gt = onehot
    label = gt * 2.0 - 1.0
    a = -label * fcps
    b = jnp.maximum(a, 0.0)
    loss = b + jnp.log(jnp.exp(-b) + jnp.exp(a - b))
    pos_loss = reduce_masked_mean(loss, gt * selb)
    neg_loss = reduce_masked_mean(loss, (1.0 - gt) * selb)
    return pos_loss + neg_loss
