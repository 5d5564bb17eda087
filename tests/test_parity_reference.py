"""Golden-value parity vs the upstream PyTorch reference (aharley/pips).

These tests instantiate the reference ``nets/pips.py`` model on CPU with
random weights, port the weights through ``pips_tpu.torchport``, and compare
full-forward outputs. Skipped when the reference checkout is not mounted.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import REFERENCE_DIR, requires_reference

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def reference_pips():
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    # reference forward calls .cuda() on a loss scalar (nets/pips.py:429);
    # neutralize for CPU-only torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    from nets.pips import Pips as TorchPips  # noqa: E402

    torch.manual_seed(125)
    model = TorchPips(S=8, stride=8)
    model.eval()
    return model


@pytest.fixture(scope="module")
def ported(reference_pips):
    from pips_tpu.models import Pips
    from pips_tpu.torchport import convert_pips_state_dict

    sd = {k: v.detach().numpy() for k, v in reference_pips.state_dict().items()}
    params = {"params": convert_pips_state_dict(sd, mixer_depth=12)}
    model = Pips(S=8, stride=8)
    return model, params


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(7)
    B, S, H, W, N = 1, 8, 128, 160, 6
    rgbs = (rng.rand(B, S, H, W, 3) * 255).astype(np.float32)
    xys = (rng.rand(B, N, 2) * [W - 32, H - 32] + 16).astype(np.float32)
    # plausible gt trajectories: query + drift
    trajs_g = xys[:, None] + rng.randn(B, S, N, 2).astype(np.float32) * 8
    vis_g = (rng.rand(B, S, N) > 0.3).astype(np.float32)
    valids = (rng.rand(B, S, N) > 0.1).astype(np.float32)
    return rgbs, xys, trajs_g, vis_g, valids


@requires_reference
def test_eval_forward_parity(reference_pips, ported, inputs):
    rgbs, xys, _, _, _ = inputs
    iters = 2

    t_rgbs = torch.from_numpy(rgbs).permute(0, 1, 4, 2, 3)  # B,S,C,H,W
    t_xys = torch.from_numpy(xys)
    with torch.no_grad():
        preds, preds2, vis_e, ffeat, _ = reference_pips(
            t_xys, t_rgbs, iters=iters, return_feat=True)

    model, params = ported
    with jax.default_matmul_precision("highest"):
        out = model.apply(params, jnp.asarray(xys), jnp.asarray(rgbs), iters=iters)

    want_traj = torch.stack(preds).numpy()  # (I, B, S, N, 2)
    got_traj = np.asarray(out.coord_predictions)
    np.testing.assert_allclose(got_traj, want_traj, rtol=2e-3, atol=2e-3)

    np.testing.assert_allclose(np.asarray(out.vis_e), vis_e.numpy(), rtol=2e-3, atol=2e-3)
    # reference ffeat is (B, N, C)
    np.testing.assert_allclose(np.asarray(out.ffeat), ffeat.numpy(), rtol=2e-3, atol=2e-3)

    want_traj2 = torch.stack(preds2).numpy()
    np.testing.assert_allclose(np.asarray(out.coord_predictions2), want_traj2,
                               rtol=2e-3, atol=2e-3)


@requires_reference
def test_train_losses_parity(reference_pips, ported, inputs):
    from pips_tpu.models.losses import balanced_ce_loss, score_map_loss, sequence_loss

    rgbs, xys, trajs_g, vis_g, valids = inputs
    iters = 2
    stride = 8

    t_rgbs = torch.from_numpy(rgbs).permute(0, 1, 4, 2, 3)
    with torch.no_grad():
        preds, _, vis_e, losses = reference_pips(
            torch.from_numpy(xys), t_rgbs, iters=iters,
            trajs_g=torch.from_numpy(trajs_g), vis_g=torch.from_numpy(vis_g),
            valids=torch.from_numpy(valids), is_train=True)
    want_seq, want_vis, want_ce = [float(l) for l in losses]

    model, params = ported
    with jax.default_matmul_precision("highest"):
        out = model.apply(params, jnp.asarray(xys), jnp.asarray(rgbs), iters=iters,
                          is_train=True, compute_fcp=True)
        got_seq = float(sequence_loss(out.coord_predictions, jnp.asarray(trajs_g),
                                      jnp.asarray(vis_g), jnp.asarray(valids), 0.8))
        got_vis = float(balanced_ce_loss(out.vis_e, jnp.asarray(vis_g),
                                         jnp.asarray(valids))[0])
        got_ce = float(score_map_loss(out.fcps, jnp.asarray(trajs_g) / stride,
                                      jnp.asarray(vis_g), jnp.asarray(valids)))

    np.testing.assert_allclose(got_seq, want_seq, rtol=5e-3)
    np.testing.assert_allclose(got_vis, want_vis, rtol=5e-3)
    np.testing.assert_allclose(got_ce, want_ce, rtol=5e-3)


@requires_reference
def test_trained_weights_rollout_parity(inputs):
    """Port fidelity beyond random init (VERDICT r1 #3): train the torch
    reference for a few Adam steps on synthetic data so the weights develop
    trained-like statistics, port, and compare a full iters=6 rollout.

    Random-init parity is necessary but not sufficient — iterated corr
    lookups through floor() discontinuities can amplify tiny drifts on
    weights with structure. This pins the port on a non-degenerate point
    of weight space at full iteration depth.
    """
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    torch.Tensor.cuda = lambda self, *a, **k: self
    from nets.pips import Pips as TorchPips

    torch.manual_seed(126)
    model_t = TorchPips(S=8, stride=8)
    model_t.train()

    rgbs, xys, trajs_g, vis_g, valids = inputs
    t_rgbs = torch.from_numpy(rgbs).permute(0, 1, 4, 2, 3)
    opt = torch.optim.AdamW(model_t.parameters(), lr=3e-4)
    for _ in range(8):
        opt.zero_grad()
        _, _, _, losses = model_t(
            torch.from_numpy(xys), t_rgbs, iters=2,
            trajs_g=torch.from_numpy(trajs_g), vis_g=torch.from_numpy(vis_g),
            valids=torch.from_numpy(valids), is_train=True)
        seq, vis, ce = losses
        total = seq + 10.0 * vis + ce
        total.backward()
        opt.step()
    model_t.eval()

    # full-depth rollout on held-out inputs
    rng = np.random.RandomState(21)
    B, S, H, W, N = 1, 8, 160, 224, 16
    rgbs2 = (rng.rand(B, S, H, W, 3) * 255).astype(np.float32)
    xys2 = (rng.rand(B, N, 2) * [W - 32, H - 32] + 16).astype(np.float32)
    with torch.no_grad():
        preds, _, vis_e, ffeat, _ = model_t(
            torch.from_numpy(xys2),
            torch.from_numpy(rgbs2).permute(0, 1, 4, 2, 3),
            iters=6, return_feat=True)

    from pips_tpu.models import Pips
    from pips_tpu.torchport import convert_pips_state_dict
    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    params = {"params": convert_pips_state_dict(sd, mixer_depth=12)}
    model = Pips(S=8, stride=8)
    with jax.default_matmul_precision("highest"):
        out = model.apply(params, jnp.asarray(xys2), jnp.asarray(rgbs2), iters=6)

    want = torch.stack(preds).numpy()               # (I, B, S, N, 2)
    got = np.asarray(out.coord_predictions)
    err = np.abs(got - want)
    # numerical-chaos policy (docs/TESTING.md): tight agreement on the first
    # refinement, bounded drift afterwards — a coordinate straddling a
    # floor() grid line flips its corr patch and diverges by design; demand
    # that stays rare and everything else agrees to fp noise
    assert err[0].max() < 5e-3, err[0].max()        # first iteration: tight
    assert np.median(err) < 2e-3, np.median(err)    # typical point: fp noise
    # a perfect port still bifurcates on grid-line points at full depth
    # (~16% of coords drift >0.1px here, in BOTH directions of comparison);
    # what a port BUG produces is systematic error — caught by the median
    # and the magnitude bound
    assert (err > 0.5).mean() < 0.10, (err > 0.5).mean()
    assert err.max() < 5.0, err.max()
    verr = np.abs(np.asarray(out.vis_e) - vis_e.numpy())
    # vis logits read the ffeats AFTER 6 residual updates — feature drift
    # accumulates like coords; 0.05 logits ~ 1% in sigmoid space
    assert np.median(verr) < 5e-2 and (verr > 0.5).mean() < 0.10, (
        np.median(verr), (verr > 0.5).mean())
    # ffeat has no iterated lookup — plain tolerance
    np.testing.assert_allclose(np.asarray(out.ffeat), ffeat.numpy(),
                               rtol=5e-3, atol=5e-3)


@requires_reference
def test_trained_weights_chaining_parity(inputs):
    """Chaining-loop parity at trained-ish weights (VERDICT r3 #5): the
    reference's per-point sliding-window loop (``chain_demo.py:40-83``) vs
    the batched ``ChainTracker`` on the same T=16 clip. BADJA/CroHD accuracy
    comes from this loop, not single windows: per-window SKIP decisions must
    agree exactly and trajectories within the drift policy (docs/TESTING.md).
    """
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    torch.Tensor.cuda = lambda self, *a, **k: self
    from nets.pips import Pips as TorchPips

    from test_chain import reference_select_skip

    torch.manual_seed(126)
    model_t = TorchPips(S=8, stride=8)
    model_t.train()

    rgbs, xys0, trajs_g, vis_g, valids = inputs
    t_rgbs = torch.from_numpy(rgbs).permute(0, 1, 4, 2, 3)
    opt = torch.optim.AdamW(model_t.parameters(), lr=3e-4)
    for _ in range(8):
        opt.zero_grad()
        _, _, _, losses = model_t(
            torch.from_numpy(xys0), t_rgbs, iters=2,
            trajs_g=torch.from_numpy(trajs_g), vis_g=torch.from_numpy(vis_g),
            valids=torch.from_numpy(valids), is_train=True)
        seq, vis, ce = losses
        (seq + 10.0 * vis + ce).backward()
        opt.step()
    model_t.eval()

    # held-out clip, longer than one window
    rng = np.random.RandomState(33)
    T, H, W, N, S, iters = 16, 128, 160, 4, 8, 3
    clip = (rng.rand(T, H, W, 3) * 255).astype(np.float32)
    xys = (rng.rand(N, 2) * [W - 32, H - 32] + 16).astype(np.float32)

    # --- reference per-point loop (chain_demo.py:40-83 semantics: window
    # padded by repeating the last frame, query = current estimate at the
    # window start, feat_init carried across windows, decaying-threshold skip)
    rt = torch.from_numpy(clip).permute(0, 3, 1, 2)[None]  # (1, T, 3, H, W)
    starts_t, trajs_t = [], np.zeros((T, N, 2), np.float32)
    for n in range(N):
        traj = np.zeros((T, 2), np.float32)
        traj[0] = xys[n]
        feat, cur, st = None, 0, []
        while True:
            st.append(cur)
            seq = rt[:, cur:cur + S]
            S_local = seq.shape[1]
            if S_local < S:
                seq = torch.cat(
                    [seq, seq[:, -1:].expand(-1, S - S_local, -1, -1, -1)], 1)
            with torch.no_grad():
                preds, _, vis, feat, _ = model_t(
                    torch.from_numpy(traj[cur][None, None]), seq, iters=iters,
                    feat_init=feat, return_feat=True)
            visp = torch.sigmoid(vis)[0, :, 0].numpy()
            traj[cur:cur + S_local] = preds[-1][0, :, 0].numpy()[:S_local]
            cur += reference_select_skip(visp, S)
            if cur >= T:
                break
        starts_t.append(st)
        trajs_t[:, n] = traj

    # --- batched ChainTracker with ported weights
    from pips_tpu.inference import ChainTracker
    from pips_tpu.models import Pips
    from pips_tpu.torchport import convert_pips_state_dict

    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    params = {"params": convert_pips_state_dict(sd, mixer_depth=12)}
    chain = ChainTracker(Pips(S=S, stride=8), params, iters=iters,
                         record_starts=True)
    with jax.default_matmul_precision("highest"):
        trajs_j, _ = chain.track_video(clip, xys)

    # skip decisions: exact agreement per point (a flipped skip re-windows
    # the whole remaining trajectory — THE failure mode of a chaining port)
    assert chain.last_window_starts == starts_t, (
        chain.last_window_starts, starts_t)

    # trajectories: drift policy as in the rollout test — iterated corr
    # lookups bifurcate on floor() grid lines, compounded across windows
    err = np.abs(trajs_j - trajs_t)
    assert np.median(err) < 2e-2, np.median(err)
    assert (err > 0.5).mean() < 0.10, (err > 0.5).mean()
    assert err.max() < 8.0, err.max()


@requires_reference
def test_feat_init_coords_init_parity(reference_pips, ported, inputs):
    """Chaining-relevant plumbing: coords_init + feat_init paths match."""
    rgbs, xys, _, _, _ = inputs
    B, S, H, W, _ = rgbs.shape
    N = xys.shape[1]
    rng = np.random.RandomState(3)
    coords_init = (xys[:, None] + rng.randn(B, S, N, 2) * 4).astype(np.float32)
    feat_init = rng.randn(B, N, 128).astype(np.float32)

    with torch.no_grad():
        preds, _, vis_e, ffeat, _ = reference_pips(
            torch.from_numpy(xys), torch.from_numpy(rgbs).permute(0, 1, 4, 2, 3),
            coords_init=torch.from_numpy(coords_init),
            feat_init=torch.from_numpy(feat_init), iters=2, return_feat=True)

    model, params = ported
    with jax.default_matmul_precision("highest"):
        out = model.apply(params, jnp.asarray(xys), jnp.asarray(rgbs),
                          coords_init=jnp.asarray(coords_init),
                          feat_init=jnp.asarray(feat_init), iters=2)
    np.testing.assert_allclose(np.asarray(out.coord_predictions),
                               torch.stack(preds).numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.ffeat), ffeat.numpy(), rtol=1e-5)
