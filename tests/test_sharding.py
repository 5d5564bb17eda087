"""Multi-device mesh tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pips_tpu.data import SyntheticPointDataset, batch_iterator
from pips_tpu.models import Pips
from pips_tpu.parallel import (make_mesh, make_sharded_forward,
                               make_sharded_train_step, replicate, shard_batch)
from pips_tpu.train.optim import make_optimizer
from pips_tpu.train.step import TrainState, make_train_step

TINY = dict(S=4, stride=8, latent_dim=16, corr_levels=3, corr_radius=2,
            mixer_dim=32, mixer_depth=2)


def _state(model, N=8, H=64, W=96):
    rgbs = jnp.zeros((1, model.S, H, W, 3))
    xys = jnp.ones((1, N, 2))
    params = model.init(jax.random.PRNGKey(0), xys, rgbs, iters=1)
    tx = make_optimizer(1e-3, 100)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_train_step_matches_single_device():
    model = Pips(**TINY)
    ds = SyntheticPointDataset(S=4, N=16, H=64, W=96, seed=11)
    batch_np = next(batch_iterator(ds, batch_size=4, num_workers=2))

    # single-device reference
    state1 = _state(model, N=16)
    step1 = jax.jit(make_train_step(model, state1.tx, iters=1,
                                    horz_flip=False, vert_flip=False))
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state1, metrics1 = step1(state1, batch1)

    # 4x2 mesh: B=4 over data, N=16 over 2-way point axis
    mesh = make_mesh((4, 2))
    state2 = jax.device_put(_state(model, N=16), replicate(mesh))
    step2 = make_sharded_train_step(model, state2.tx, mesh, iters=1,
                                    horz_flip=False, vert_flip=False,
                                    donate_state=False)
    batch2 = shard_batch(mesh, batch_np)
    state2, metrics2 = step2(state2, batch2)

    np.testing.assert_allclose(float(metrics1["total_loss"]),
                               float(metrics2["total_loss"]), rtol=1e-4)
    p1 = jax.tree.leaves(state1.params)[0]
    p2 = jax.tree.leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-3, atol=1e-5)


def test_shard_batch_drops_host_side_extras():
    """Datasets may carry keys the step never consumes (FlyingThings'
    occs/masks feed summaries); shard_batch must not choke on or transfer
    them (regression: KeyError 'occs' on the first real-pipeline run)."""
    ds = SyntheticPointDataset(S=4, N=16, H=64, W=96, seed=13)
    batch_np = dict(next(batch_iterator(ds, batch_size=4, num_workers=2)))
    batch_np["occs"] = np.zeros((4, 4, 64, 96), np.float32)
    batch_np["masks"] = np.ones((4, 4, 64, 96), np.float32)
    mesh = make_mesh((4, 2))
    out = shard_batch(mesh, batch_np)
    assert set(out) == {"rgbs", "trajs", "visibles", "valids"}
    assert out["rgbs"].shape == batch_np["rgbs"].shape


def test_sharded_grad_acc_matches_single_device():
    """grad_acc=2 microbatching on the mesh applies the same summed grads as
    the same scan on one device (SGD(1.0) makes param deltas == grads —
    Adam would amplify fp noise on near-zero entries)."""
    import optax

    model = Pips(**TINY)
    ds = SyntheticPointDataset(S=4, N=16, H=64, W=96, seed=13)
    batch_np = next(batch_iterator(ds, batch_size=4, num_workers=2))
    micro_np = {k: v.reshape(2, 2, *v.shape[1:]) for k, v in batch_np.items()}

    tx = optax.sgd(1.0)
    rgbs0 = jnp.zeros((1, model.S, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 16, 2)), rgbs0, iters=1)

    state1 = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step1 = jax.jit(make_train_step(model, tx, iters=1, horz_flip=False,
                                    vert_flip=False, grad_acc=2))
    state1, metrics1 = step1(state1, {k: jnp.asarray(v) for k, v in micro_np.items()})

    mesh = make_mesh((2, 2))
    state2 = jax.device_put(
        TrainState.create(apply_fn=model.apply, params=params, tx=tx),
        replicate(mesh))
    step2 = make_sharded_train_step(model, tx, mesh, iters=1,
                                    horz_flip=False, vert_flip=False,
                                    grad_acc=2, donate_state=False)
    state2, metrics2 = step2(state2, shard_batch(mesh, micro_np, grad_acc=2))

    np.testing.assert_allclose(float(metrics1["total_loss"]),
                               float(metrics2["total_loss"]), rtol=1e-4)
    g1 = jax.tree.map(lambda a, b: a - b, params, state1.params)
    g2 = jax.tree.map(lambda a, b: a - b, params, state2.params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        # noise floor covers zero-true-grad biases (instance-norm cancels
        # them); cross-device psum reassociation raises it vs the 1-device
        # case. A summed-vs-averaged regression is 2x on O(10) grads.
        atol = 5e-4 + 1e-5 * np.abs(a).max()
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=atol)


def test_sharded_forward_points_axis():
    model = Pips(**TINY)
    state = _state(model, N=16)
    mesh = make_mesh((4, 2))
    fwd = make_sharded_forward(model, mesh, iters=1)

    rng = np.random.RandomState(0)
    rgbs = jnp.asarray(rng.rand(1, 4, 64, 96, 3) * 255, jnp.float32)
    xys = jnp.asarray(rng.rand(1, 16, 2) * [80, 50] + 4, jnp.float32)
    params = jax.device_put(state.params, replicate(mesh))
    trajs, vis, ffeat = fwd(params, xys, rgbs)
    assert trajs.shape == (1, 4, 16, 2)
    assert vis.shape == (1, 4, 16)

    # same numbers as unsharded forward
    out = model.apply(state.params, xys, rgbs, iters=1, is_train=False,
                      use_fused_corr=True)
    np.testing.assert_allclose(np.asarray(trajs),
                               np.asarray(out.coord_predictions[-1]),
                               rtol=1e-4, atol=1e-4)


def test_default_mesh_shape():
    from pips_tpu.parallel import default_mesh_shape
    assert default_mesh_shape(8, 4, 768) == (4, 2)
    assert default_mesh_shape(8, 1, 16) == (1, 8)   # --quick on a v5e-8
    assert default_mesh_shape(8, 8, 768) == (8, 1)
    assert default_mesh_shape(8, 3, 7) == (1, 1)    # nothing divides: 1 device
    assert default_mesh_shape(1, 4, 768) == (1, 1)


def test_sharded_bf16_fused_matches_single_device():
    """The PRODUCTION config — bf16 compute + fused Pallas mixer kernel —
    on the (4,2) mesh matches the same config on one device (r2 gap: every
    mesh test ran f32/unfused; the deployed combination was never validated
    on any mesh). Pallas runs in the plain jax interpreter on CPU (the
    io_callback-based TPU emulator cannot be SPMD-partitioned)."""
    from pips_tpu.kernels.mixer_pallas import interpret_mode

    model = Pips(dtype=jnp.bfloat16, fuse_chanff=True, **TINY)
    ds = SyntheticPointDataset(S=4, N=16, H=64, W=96, seed=17)
    batch_np = next(batch_iterator(ds, batch_size=4, num_workers=2))

    with interpret_mode():
        state1 = _state(model, N=16)
        step1 = jax.jit(make_train_step(model, state1.tx, iters=1,
                                        horz_flip=False, vert_flip=False))
        batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
        state1, metrics1 = step1(state1, batch1)

        mesh = make_mesh((4, 2))
        state2 = jax.device_put(_state(model, N=16), replicate(mesh))
        step2 = make_sharded_train_step(model, state2.tx, mesh, iters=1,
                                        horz_flip=False, vert_flip=False,
                                        donate_state=False)
        state2, metrics2 = step2(state2, shard_batch(mesh, batch_np))

    assert np.isfinite(float(metrics2["total_loss"]))
    np.testing.assert_allclose(float(metrics1["total_loss"]),
                               float(metrics2["total_loss"]), rtol=1e-3)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        # bf16 compute + cross-device psum reassociation noise floor
        atol = 1e-3 + 1e-3 * np.abs(a).max()
        np.testing.assert_allclose(b, a, rtol=1e-2, atol=atol)


def test_sharded_forward_bf16_fused_points_axis():
    """Eval-mode bf16+fused forward with points over the full mesh matches
    the unsharded forward (the serving config on a pod slice)."""
    from pips_tpu.kernels.mixer_pallas import interpret_mode

    model = Pips(dtype=jnp.bfloat16, fuse_chanff=True, **TINY)
    with interpret_mode():
        state = _state(model, N=16)
        mesh = make_mesh((4, 2))
        # chaos policy (b) (docs/TESTING.md): a SINGLE refinement step —
        # with untrained bf16 weights, iterating floor() corr lookups
        # amplifies partitioning ulp-noise to O(px) scatter by iter 2
        fwd = make_sharded_forward(model, mesh, iters=1)
        rng = np.random.RandomState(5)
        rgbs = jnp.asarray(rng.rand(1, 4, 64, 96, 3) * 255, jnp.float32)
        xys = jnp.asarray(rng.rand(1, 16, 2) * [80, 50] + 4, jnp.float32)
        params = jax.device_put(state.params, replicate(mesh))
        trajs, vis, _ = fwd(params, xys, rgbs)

        out = model.apply(state.params, xys, rgbs, iters=1, is_train=False,
                          corr_mode="onehot")  # same path as make_sharded_forward
    assert np.isfinite(np.asarray(trajs, np.float32)).all()
    err = np.abs(np.asarray(trajs, np.float32)
                 - np.asarray(out.coord_predictions[-1], np.float32))
    assert np.median(err) < 0.05, np.median(err)
    assert err.max() < 1.0, err.max()


def test_mesh_window_tracker_matches_single_device():
    """WindowTracker(mesh=...) — the serving-path sharding (run_davis --mesh,
    chain engines) — matches the single-device tracker."""
    from pips_tpu.inference.window import WindowTracker

    model = Pips(**TINY)
    state = _state(model, N=16)
    rng = np.random.RandomState(0)
    rgbs = (rng.rand(1, 4, 48, 64, 3) * 255).astype(np.float32)
    xys = (rng.rand(1, 16, 2) * [56, 40] + 4).astype(np.float32)

    single = WindowTracker(model, state.params, iters=2)
    sharded = WindowTracker(model, state.params, iters=2,
                            mesh=make_mesh((1, 8)))
    t1, v1 = single(xys, rgbs)
    t2, v2 = sharded(xys, rgbs)
    assert np.isfinite(t2).all()
    # chaos policy (docs/TESTING.md): sharded matmul partitioning shifts
    # reductions by ulps; after 2 refinement iters through floor() corr
    # lookups that is O(1e-3) px with untrained weights
    np.testing.assert_allclose(t1, t2, atol=5e-3)
    np.testing.assert_allclose(v1, v2, atol=5e-3)


def test_mesh_chain_tracker_matches_single_device():
    """ChainTracker(mesh=...): same trajectories as the single-device engine.
    Skip rule pinned (fixed_skip) so window schedules can't diverge through
    untrained-weight vis noise (docs/TESTING.md determinism injection)."""
    from pips_tpu.inference.chain import ChainTracker

    def fixed_skip(vis, S):
        return np.full(vis.shape[0], 3, np.int64)

    model = Pips(**TINY)
    state = _state(model, N=16)
    rng = np.random.RandomState(2)
    vid = (rng.rand(10, 48, 64, 3) * 255).astype(np.float32)
    q = (rng.rand(16, 2) * [56, 40] + 4).astype(np.float32)

    host = ChainTracker(model, state.params, iters=2, capacity=16,
                        select_fn=fixed_skip)
    meshed = ChainTracker(model, state.params, iters=2, capacity=16,
                          select_fn=fixed_skip, mesh=make_mesh((1, 8)))
    tr1, vi1 = host.track_video(vid, q)
    tr2, vi2 = meshed.track_video(vid, q)
    assert np.isfinite(tr2).all()
    # same tolerance convention as the host-vs-on-device chain parity test
    # (test_chain.py): chained windows re-query through floor() corr lookups,
    # compounding ulp-level partitioning noise; window 1 must stay tight
    np.testing.assert_allclose(tr1[:4], tr2[:4], atol=1e-2)
    np.testing.assert_allclose(tr1, tr2, atol=0.5)
    # vis sits downstream of the chained coords: an O(0.3 px) late-window
    # coordinate split moves a sigmoid through its steep region
    np.testing.assert_allclose(vi1, vi2, atol=0.15)
