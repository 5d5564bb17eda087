"""Loss functions vs torch oracles (standalone — no reference checkout needed)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pips_tpu.models.losses import balanced_ce_loss, score_map_loss, sequence_loss


def torch_reduce_masked_mean(x, mask):
    return (x * mask).sum() / (1e-6 + mask.sum())


def test_balanced_ce_loss_matches_torch(rng):
    pred = torch.from_numpy(rng.randn(2, 4, 6).astype(np.float32) * 3)
    gt = torch.from_numpy((rng.rand(2, 4, 6) > 0.5).astype(np.float32))
    valid = torch.from_numpy((rng.rand(2, 4, 6) > 0.3).astype(np.float32))

    pos = (gt > 0.95).float()
    neg = (gt < 0.05).float()
    label = pos * 2.0 - 1.0
    a = -label * pred
    b = F.relu(a)
    loss = b + torch.log(torch.exp(-b) + torch.exp(a - b))
    want = torch_reduce_masked_mean(loss, pos * valid) \
        + torch_reduce_masked_mean(loss, neg * valid)

    got, _ = balanced_ce_loss(jnp.asarray(pred.numpy()), jnp.asarray(gt.numpy()),
                              jnp.asarray(valid.numpy()))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_sequence_loss_matches_torch(rng):
    I, B, S, N = 3, 2, 4, 5
    preds = rng.randn(I, B, S, N, 2).astype(np.float32) * 10
    gt = rng.randn(B, S, N, 2).astype(np.float32) * 10
    vis = np.ones((B, S, N), np.float32)
    valids = (rng.rand(B, S, N) > 0.2).astype(np.float32)

    # torch oracle mirroring the published gamma-weighted L1
    gamma = 0.8
    flow_loss = 0.0
    for i in range(I):
        w = gamma ** (I - i - 1)
        il = torch.mean((torch.from_numpy(preds[i]) - torch.from_numpy(gt)).abs(), dim=3)
        flow_loss += w * torch_reduce_masked_mean(il, torch.from_numpy(valids))
    want = float(flow_loss / I)

    got = float(sequence_loss(jnp.asarray(preds), jnp.asarray(gt),
                              jnp.asarray(vis), jnp.asarray(valids), gamma))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_score_map_loss_matches_indexing_oracle(rng):
    """vs a literal reimplementation of the select-then-one-hot formulation."""
    B, S, I, N, H8, W8 = 1, 3, 2, 6, 8, 10
    fcps = rng.randn(B, S, I, N, H8, W8).astype(np.float32)
    trajs_g = (rng.rand(B, S, N, 2) * [W8 + 3, H8 + 3] - 2).astype(np.float32)
    vis_g = (rng.rand(B, S, N) > 0.4).astype(np.float32)
    valids = (rng.rand(B, S, N) > 0.2).astype(np.float32)

    fcp_ = torch.from_numpy(fcps).permute(0, 1, 3, 2, 4, 5).reshape(B * S * N, I, H8, W8)
    xy_ = torch.from_numpy(trajs_g).reshape(B * S * N, 2).round().long()
    vis_ = torch.from_numpy(vis_g).reshape(B * S * N)
    val_ = torch.from_numpy(valids).reshape(B * S * N)
    x_, y_ = xy_[:, 0], xy_[:, 1]
    ind = (x_ >= 0) & (x_ <= W8 - 1) & (y_ >= 0) & (y_ <= H8 - 1) \
        & (val_ > 0) & (vis_ > 0)
    fcp_sel = fcp_[ind]
    xy_sel = xy_[ind]
    gt_ = torch.zeros_like(fcp_sel)
    for n in range(fcp_sel.shape[0]):
        gt_[n, :, xy_sel[n, 1], xy_sel[n, 0]] = 1
    pred = fcp_sel.reshape(-1)
    gt_f = gt_.reshape(-1)
    pos = (gt_f > 0.95).float()
    neg = (gt_f < 0.05).float()
    label = pos * 2.0 - 1.0
    a = -label * pred
    b = F.relu(a)
    loss = b + torch.log(torch.exp(-b) + torch.exp(a - b))
    want = float(torch_reduce_masked_mean(loss, pos)
                 + torch_reduce_masked_mean(loss, neg))

    got = float(score_map_loss(jnp.asarray(fcps), jnp.asarray(trajs_g),
                               jnp.asarray(vis_g), jnp.asarray(valids)))
    np.testing.assert_allclose(got, want, rtol=1e-4)
