"""End-to-end training tests on the synthetic dataset (tiny model, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pips_tpu.data import SyntheticPointDataset, batch_iterator
from pips_tpu.models import Pips
from pips_tpu.train.optim import make_optimizer, onecycle_linear
from pips_tpu.train.step import TrainState, apply_flip_doubling, make_train_step
from pips_tpu.utils import saverloader

TINY = dict(S=4, stride=8, latent_dim=16, corr_levels=3, corr_radius=2,
            mixer_dim=32, mixer_depth=2)


def make_tiny_state(model, H=64, W=96, N=8, lr=1e-3, num_steps=100):
    rgbs = jnp.zeros((1, model.S, H, W, 3))
    xys = jnp.ones((1, N, 2))
    params = model.init(jax.random.PRNGKey(0), xys, rgbs, iters=1)
    tx = make_optimizer(lr, num_steps)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


@pytest.fixture(scope="module")
def tiny_batch():
    ds = SyntheticPointDataset(S=4, N=8, H=64, W=96, seed=3)
    it = batch_iterator(ds, batch_size=2, num_workers=2)
    return next(it)


def test_onecycle_schedule():
    sched = onecycle_linear(1e-3, 1000)
    assert float(sched(0)) == pytest.approx(1e-3 / 25, rel=1e-4)
    assert float(sched(50)) == pytest.approx(1e-3, rel=1e-3)
    assert float(sched(1000)) < 1e-4


def test_flip_doubling(tiny_batch):
    H, W = tiny_batch["rgbs"].shape[2:4]
    out = apply_flip_doubling(
        {k: jnp.asarray(v) for k, v in tiny_batch.items()}, True, True)
    B = tiny_batch["rgbs"].shape[0]
    assert out["rgbs"].shape[0] == 4 * B
    # horz flip: x' = W-1-x
    np.testing.assert_allclose(np.asarray(out["trajs"][B, ..., 0]),
                               W - 1 - tiny_batch["trajs"][0, ..., 0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["rgbs"][B]),
                               tiny_batch["rgbs"][0, :, :, ::-1], rtol=1e-6)
    # vert flip of the first half: y' = H-1-y
    np.testing.assert_allclose(np.asarray(out["trajs"][2 * B, ..., 1]),
                               H - 1 - tiny_batch["trajs"][0, ..., 1], rtol=1e-6)


def test_train_step_reduces_loss(tiny_batch):
    model = Pips(**TINY)
    state = make_tiny_state(model, lr=3e-4)
    step = jax.jit(make_train_step(model, state.tx, iters=2,
                                   horz_flip=False, vert_flip=False))
    batch = {k: jnp.asarray(v) for k, v in tiny_batch.items()}
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_grad_acc_matches_sum(tiny_batch):
    """The scan-accumulated grad_acc step applies exactly the SUM of the
    per-microbatch gradients (torch ``backward()`` accumulation semantics,
    reference ``train.py:298-325``)."""
    import optax
    from pips_tpu.train.step import train_loss_fn

    model = Pips(**TINY)
    # SGD(1.0) makes param deltas EQUAL the applied grads — Adam would
    # amplify fp-reassociation noise on near-zero entries (m/sqrt(v) is
    # scale-invariant) and mask a real summed-vs-averaged regression.
    tx = optax.sgd(1.0)
    rgbs0 = jnp.zeros((1, model.S, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 2)), rgbs0, iters=1)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch.items()}
    micro = {k: v.reshape(2, 1, *v.shape[1:]) for k, v in batch.items()}

    # oracle: independent per-microbatch grads, summed
    grad_fn = jax.jit(jax.grad(lambda p, b: train_loss_fn(model, p, b, 1)[0]))
    g0 = grad_fn(state.params, {k: v[0] for k, v in micro.items()})
    g1 = grad_fn(state.params, {k: v[1] for k, v in micro.items()})
    summed = jax.tree.map(jnp.add, g0, g1)

    step2 = jax.jit(make_train_step(model, tx, iters=1, horz_flip=False,
                                    vert_flip=False, grad_acc=2))
    state2, metrics2 = step2(state, micro)
    assert np.isfinite(float(metrics2["total_loss"]))
    applied = jax.tree.map(lambda a, b: a - b, state.params, state2.params)
    # tolerances are magnitude-scaled: scan-compiled vs separately-jitted
    # grads differ by fp reassociation proportional to the leaf's grad scale
    # (stem kernel grads are O(50)), and biases feeding instance norm have
    # *exactly zero* true gradient, leaving only cancellation noise (~1e-4).
    # A summed-vs-averaged regression is a 2x error and still fails loudly.
    for want, got in zip(jax.tree.leaves(summed), jax.tree.leaves(applied)):
        want, got = np.asarray(want), np.asarray(got)
        atol = 1e-4 + 1e-5 * np.abs(want).max()
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=atol)


def test_train_step_bf16_reduces_loss(tiny_batch):
    """bf16 mixed-precision training (params f32, compute bf16) optimizes."""
    model = Pips(dtype=jnp.bfloat16, **TINY)
    state = make_tiny_state(model, lr=3e-4)
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(state.params))
    step = jax.jit(make_train_step(model, state.tx, iters=2,
                                   horz_flip=False, vert_flip=False))
    batch = {k: jnp.asarray(v) for k, v in tiny_batch.items()}
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # grads landed in f32 params
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(state.params))


def test_compilation_cache_opt_in(tmp_path, monkeypatch):
    """PIPS_JAX_CACHE wires jax's persistent compilation cache; unset = no-op."""
    import pips_tpu.utils.compcache as cc

    monkeypatch.setattr(cc, "_enabled", False)
    monkeypatch.delenv("PIPS_JAX_CACHE", raising=False)
    assert cc.maybe_enable_compilation_cache() is None
    cache_dir = str(tmp_path / "jaxcache")
    monkeypatch.setenv("PIPS_JAX_CACHE", cache_dir)
    assert cc.maybe_enable_compilation_cache() == cache_dir
    assert jax.config.jax_compilation_cache_dir == cache_dir
    # idempotent
    assert cc.maybe_enable_compilation_cache() == cache_dir


def test_compilation_cache_keys_are_path_independent(tmp_path):
    """Cache keys must not depend on the cache dir's location, or committed
    entries are unreadable from any other checkout/scratch path (r5: jax's
    default enables the GPU per-fusion autotune cache, which serializes the
    ABSOLUTE cache dir into debug_options -> into every key; one such run
    missed 100% of the committed bench cache). Two fresh processes caching
    the same computation at different dirs must produce identical keys."""
    import os
    import subprocess
    import sys

    prog = (
        "import os; os.environ['PIPS_JAX_CACHE'] = os.environ['_CDIR']\n"
        "from pips_tpu.utils.compcache import maybe_enable_compilation_cache\n"
        "maybe_enable_compilation_cache()\n"
        "import jax, jax.numpy as jnp\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.jit(lambda x: jnp.sin(x) @ x.T)(jnp.ones((64, 64)))"
        ".block_until_ready()\n"
    )
    names = []
    for sub in ("a", "deeper/nested/b"):
        cdir = tmp_path / sub
        cdir.mkdir(parents=True)
        env = dict(os.environ, _CDIR=str(cdir), JAX_PLATFORMS="cpu")
        subprocess.run([sys.executable, "-c", prog], check=True, env=env,
                       cwd=os.path.dirname(os.path.dirname(__file__)))
        entries = sorted(p.name for p in cdir.iterdir())
        assert entries, f"no cache entries written under {cdir}"
        names.append(entries)
    assert names[0] == names[1], (
        f"cache keys depend on the cache dir path:\n{names[0]}\nvs\n{names[1]}")


def test_resolve_dtype_wiring():
    """cfg.dtype reaches the model (regression: it was a dead flag)."""
    from pips_tpu.train.config import TrainConfig
    from pips_tpu.train.loop import resolve_dtype
    assert resolve_dtype("float32") is None
    assert resolve_dtype("bfloat16") == jnp.bfloat16
    assert resolve_dtype(TrainConfig().dtype) in (None, jnp.bfloat16)
    with pytest.raises(ValueError):
        resolve_dtype("float16")


def test_saverloader_roundtrip(tmp_path, tiny_batch):
    model = Pips(**TINY)
    state = make_tiny_state(model)
    ckpt = str(tmp_path / "ckpts")
    saverloader.save(ckpt, jax.device_get(state), 7, keep_latest=2)
    saverloader.save(ckpt, jax.device_get(state), 12, keep_latest=2)
    saverloader.save(ckpt, jax.device_get(state), 20, keep_latest=2)
    assert saverloader.list_steps(ckpt) == [12, 20]  # keep-latest pruning
    restored, step = saverloader.load(ckpt, jax.device_get(state))
    assert step == 20
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_load_params_from_trainstate_ckpt(tmp_path):
    """Eval-side load_params unwraps a FULL TrainState checkpoint (the train
    loop saves {step, params, opt_state}; regression: run_flt crashed trying
    to restore it into a bare variables target)."""
    from pips_tpu.evals.common import load_params

    model = Pips(**TINY)
    state = make_tiny_state(model)
    saverloader.save(str(tmp_path), jax.device_get(state), 5)
    params = load_params(model, str(tmp_path))
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # bare variables checkpoints still load
    saverloader.save(str(tmp_path), jax.device_get(state.params), 6)
    params2 = load_params(model, str(tmp_path))
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(params2)[0]),
                               np.asarray(jax.tree.leaves(state.params)[0]))


def test_saverloader_ignore_load(tmp_path):
    model = Pips(**TINY)
    state = make_tiny_state(model)
    params0 = jax.device_get(state.params)
    saverloader.save(str(tmp_path), params0, 1)
    # perturb target, then load ignoring vis_predictor
    perturbed = jax.tree.map(lambda x: x + 1.0, params0)
    restored, _ = saverloader.load(str(tmp_path), perturbed, ignore_load=["vis_predictor"])
    np.testing.assert_allclose(
        restored["params"]["fnet"]["conv1"]["Conv_0"]["bias"],
        params0["params"]["fnet"]["conv1"]["Conv_0"]["bias"])
    np.testing.assert_allclose(
        restored["params"]["vis_predictor"]["bias"],
        perturbed["params"]["vis_predictor"]["bias"])


def test_inloop_ce_matches_stacked(tiny_batch):
    """ce_gt in-loop accumulation == stacked score_map_loss exactly."""
    from pips_tpu.models.losses import score_map_loss

    model = Pips(**TINY)
    state = make_tiny_state(model)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch.items()}
    out_stacked = model.apply(state.params, batch["trajs"][:, 0], batch["rgbs"],
                              iters=2, is_train=True, compute_fcp=True)
    want = float(score_map_loss(out_stacked.fcps, batch["trajs"] / model.stride,
                                batch["visibles"], batch["valids"]))
    out_lean = model.apply(state.params, batch["trajs"][:, 0], batch["rgbs"],
                           iters=2, is_train=True, compute_fcp=True,
                           ce_gt=(batch["trajs"], batch["visibles"], batch["valids"]))
    assert out_lean.fcps is None
    np.testing.assert_allclose(float(out_lean.ce_loss), want, rtol=1e-5)


def test_grad_acc_metrics_cover_full_batch(tiny_batch):
    """Logged grad_acc metrics are the mean over ALL microbatches (the full
    effective batch), not a sample of the last one (regression: r2 logged
    metrics_seq[-1], a 1/grad_acc-sized sample)."""
    import optax
    from pips_tpu.train.step import train_loss_fn

    model = Pips(**TINY)
    tx = optax.sgd(1.0)
    rgbs0 = jnp.zeros((1, model.S, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 2)), rgbs0,
                        iters=1)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch.items()}
    micro = {k: v.reshape(2, 1, *v.shape[1:]) for k, v in batch.items()}

    loss_fn = jax.jit(lambda p, b: train_loss_fn(model, p, b, 1)[1])
    m0 = loss_fn(state.params, {k: v[0] for k, v in micro.items()})
    m1 = loss_fn(state.params, {k: v[1] for k, v in micro.items()})

    step2 = jax.jit(make_train_step(model, tx, iters=1, horz_flip=False,
                                    vert_flip=False, grad_acc=2))
    _, metrics = step2(state, micro)
    for k in metrics:
        want = (float(m0[k]) + float(m1[k])) / 2.0
        np.testing.assert_allclose(float(metrics[k]), want, rtol=1e-4,
                                   err_msg=k)
    # the microbatches genuinely differ, so a last-only regression would fail
    assert abs(float(m0["total_loss"]) - float(m1["total_loss"])) > 1e-6


class _RecordingDataset:
    """(sample, gotit) protocol stub: records every requested index; indices
    in `bad` fail (gotit=False)."""

    def __init__(self, n, bad=()):
        self.n = n
        self.bad = set(bad)
        self.requested = []

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        self.requested.append(int(i))
        sample = {"x": np.full((2,), float(i), np.float32)}
        return sample, i not in self.bad


def test_batch_iterator_process_pool_matches_threads():
    """use_processes=True (spawned workers) yields byte-identical batches to
    the thread pool for the same seed — per-index dataset seeding makes the
    sample stream independent of which worker runs it."""
    from pips_tpu.data import SyntheticPointDataset

    ds = SyntheticPointDataset(S=4, N=8, H=32, W=48)
    it_t = batch_iterator(ds, batch_size=2, seed=7, num_workers=2)
    it_p = batch_iterator(ds, batch_size=2, seed=7, num_workers=2,
                          use_processes=True)
    for _ in range(3):
        bt, bp = next(it_t), next(it_p)
        assert sorted(bt) == sorted(bp)
        for k in bt:
            np.testing.assert_array_equal(bt[k], bp[k])


def test_batch_iterator_sequential_visits_every_index():
    """shuffle=False visits each index exactly once per epoch, in order,
    skipping only genuinely-failed samples (regression: r2 advanced the
    cursor by 2x the batch and silently dropped half the dataset)."""
    ds = _RecordingDataset(12, bad={3, 7})
    it = batch_iterator(ds, batch_size=2, shuffle=False, num_workers=1)
    got = [b for _ in range(5) for b in next(it)["x"][:, 0]]
    # 10 good samples consumed = indices 0..11 minus the two bad ones
    assert got == [float(i) for i in range(12) if i not in (3, 7)]
    assert sorted(ds.requested[:12]) == list(range(12))  # each asked once
