"""Shape/behavior tests for the Pips model (small configs, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pips_tpu.models import Pips


@pytest.fixture(scope="module")
def small_model():
    model = Pips(S=4, stride=8, latent_dim=16, corr_levels=3, corr_radius=2,
                 mixer_dim=32, mixer_depth=2)
    B, S, H, W, N = 1, 4, 64, 96, 6
    rgbs = jnp.asarray(np.random.RandomState(0).rand(B, S, H, W, 3) * 255, jnp.float32)
    xys = jnp.asarray(np.random.RandomState(1).rand(B, N, 2) * [W - 8, H - 8] + 4,
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), xys, rgbs, iters=1)
    return model, params, xys, rgbs


def test_forward_shapes(small_model):
    model, params, xys, rgbs = small_model
    B, S, H, W, _ = rgbs.shape
    N = xys.shape[1]
    I = 2
    out = model.apply(params, xys, rgbs, iters=I)
    assert out.coord_predictions.shape == (I, B, S, N, 2)
    assert out.coord_predictions2.shape == (I + 4, B, S, N, 2)
    assert out.vis_e.shape == (B, S, N)
    assert out.ffeat.shape == (B, N, 16)
    assert out.fcps is None


def test_eval_locks_frame0(small_model):
    model, params, xys, rgbs = small_model
    out = model.apply(params, xys, rgbs, iters=2, is_train=False)
    np.testing.assert_allclose(np.asarray(out.coord_predictions[-1][:, 0]),
                               np.asarray(xys), rtol=1e-5, atol=1e-5)


def test_train_mode_moves_frame0(small_model):
    model, params, xys, rgbs = small_model
    out = model.apply(params, xys, rgbs, iters=2, is_train=True)
    # frame-0 coords are free to move during training
    assert not np.allclose(np.asarray(out.coord_predictions[-1][:, 0]), np.asarray(xys))


def test_fused_corr_matches_unfused(small_model):
    model, params, xys, rgbs = small_model
    out_a = model.apply(params, xys, rgbs, iters=2, use_fused_corr=False)
    out_b = model.apply(params, xys, rgbs, iters=2, use_fused_corr=True)
    # tolerance: fp reassociation between the paths amplifies chaotically
    # through the second refinement iteration (floor-boundary cells)
    np.testing.assert_allclose(np.asarray(out_a.coord_predictions),
                               np.asarray(out_b.coord_predictions), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_a.vis_e), np.asarray(out_b.vis_e),
                               rtol=1e-3, atol=1e-3)


def test_fcp_shapes(small_model):
    model, params, xys, rgbs = small_model
    B, S, H, W, _ = rgbs.shape
    N = xys.shape[1]
    out = model.apply(params, xys, rgbs, iters=2, is_train=True, compute_fcp=True)
    assert out.fcps.shape == (B, S, 2, N, H // 8, W // 8)


def test_feat_init_passthrough(small_model):
    model, params, xys, rgbs = small_model
    out1 = model.apply(params, xys, rgbs, iters=1)
    feat = out1.ffeat + 0.1
    out2 = model.apply(params, xys, rgbs, iters=1, feat_init=feat)
    np.testing.assert_allclose(np.asarray(out2.ffeat), np.asarray(feat), rtol=1e-6)
    assert not np.allclose(np.asarray(out1.vis_e), np.asarray(out2.vis_e))


def test_encode_track_composition(small_model):
    model, params, xys, rgbs = small_model
    out_full = model.apply(params, xys, rgbs, iters=2)
    fmaps = model.apply(params, rgbs, method=Pips.encode)
    out_split = model.apply(params, fmaps, xys, iters=2, method=Pips.track)
    np.testing.assert_allclose(np.asarray(out_full.coord_predictions),
                               np.asarray(out_split.coord_predictions), rtol=1e-5, atol=1e-5)


def test_corr_modes_equivalent(small_model):
    from jax.experimental.pallas import tpu as pltpu

    model, params, xys, rgbs = small_model
    ref = model.apply(params, xys, rgbs, iters=2, corr_mode="full")
    for mode in ("fused", "onehot"):
        out = model.apply(params, xys, rgbs, iters=2, corr_mode=mode)
        np.testing.assert_allclose(np.asarray(out.coord_predictions),
                                   np.asarray(ref.coord_predictions),
                                   rtol=1e-3, atol=1e-3, err_msg=mode)
    with pltpu.force_tpu_interpret_mode():
        out = model.apply(params, xys, rgbs, iters=2, corr_mode="pallas")
    np.testing.assert_allclose(np.asarray(out.coord_predictions),
                               np.asarray(ref.coord_predictions),
                               rtol=1e-3, atol=1e-3, err_msg="pallas")


def test_bfloat16_forward_close_to_fp32(small_model):
    import jax.numpy as jnp

    model, params, xys, rgbs = small_model
    # single refinement iteration: with random (untrained) weights the
    # iteration map is non-contractive, so multi-iter bf16-vs-f32 drift is
    # unbounded; one step bounds the per-step rounding error
    out32 = model.apply(params, xys, rgbs, iters=1, corr_mode="onehot")
    model16 = Pips(S=4, stride=8, latent_dim=16, corr_levels=3, corr_radius=2,
                   mixer_dim=32, mixer_depth=2, dtype=jnp.bfloat16)
    out16 = model16.apply(params, xys, rgbs, iters=1, corr_mode="onehot")
    assert out16.coord_predictions.dtype == jnp.float32  # coords stay f32
    d = np.abs(np.asarray(out16.coord_predictions[-1])
               - np.asarray(out32.coord_predictions[-1]))
    assert d.max() < 0.5, d.max()
    assert np.median(d) < 0.1


def test_fuse_chanff_model_equivalence(small_model):
    """Full model with the fused mixer kernel == unfused, in bf16, including
    gradients through the train loss (custom VJP path)."""
    from jax.experimental.pallas import tpu as pltpu

    _, params, xys, rgbs = small_model
    kw = dict(S=4, stride=8, latent_dim=16, corr_levels=3, corr_radius=2,
              mixer_dim=32, mixer_depth=2, dtype=jnp.bfloat16)
    m0 = Pips(**kw, fuse_chanff=False)
    m1 = Pips(**kw, fuse_chanff=True)

    out0 = m0.apply(params, xys, rgbs, iters=2, corr_mode="onehot")
    with pltpu.force_tpu_interpret_mode():
        out1 = m1.apply(params, xys, rgbs, iters=2, corr_mode="onehot")
    # chaos policy (docs/TESTING.md): the fused kernel computes LN/GELU in
    # f32 internally, a bf16-ulp-level perturbation that iterated floor()
    # corr lookups amplify on a few points — demand typical agreement and
    # bounded, rare outliers rather than elementwise closeness
    err = np.abs(np.asarray(out1.coord_predictions, np.float32)
                 - np.asarray(out0.coord_predictions, np.float32))
    assert np.median(err) < 0.1, np.median(err)
    assert (err > 1.0).mean() < 0.25, (err > 1.0).mean()
    assert err.max() < 10.0, err.max()

    def loss(m):
        def f(p):
            out = m.apply(p, xys, rgbs, iters=1, is_train=True)
            return jnp.mean(jnp.square(out.coord_predictions.astype(jnp.float32) - xys[None, :, None]))
        return f

    g0 = jax.grad(loss(m0))(params)
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss(m1))(params)
    n0 = np.sqrt(sum(float(jnp.sum(jnp.square(x))) for x in jax.tree.leaves(g0)))
    n1 = np.sqrt(sum(float(jnp.sum(jnp.square(x))) for x in jax.tree.leaves(g1)))
    assert np.isfinite(n1) and n1 > 0
    assert abs(n1 - n0) / n0 < 0.2, (n0, n1)
