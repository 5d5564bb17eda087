"""Fused channel-FF mixer kernel (kernels/mixer_pallas.py).

Interpret mode on CPU; compiled on TPU. The fused block keeps LN/GELU in f32,
so vs the unfused flax bf16 path the tolerance is bf16-level; vs the
matching-semantics XLA reference it is tight.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from pips_tpu.kernels.mixer_pallas import chan_ff_block, chan_ff_reference


@pytest.fixture
def args():
    rng = np.random.RandomState(0)
    R, D, F = 256, 128, 512
    x = jnp.asarray(rng.randn(R, D), jnp.float32)
    s = jnp.asarray(1.0 + 0.1 * rng.randn(D), jnp.float32)
    b = jnp.asarray(0.1 * rng.randn(D), jnp.float32)
    w1 = jnp.asarray(rng.randn(D, F) * 0.05, jnp.float32)
    b1 = jnp.asarray(0.1 * rng.randn(F), jnp.float32)
    w2 = jnp.asarray(rng.randn(F, D) * 0.05, jnp.float32)
    b2 = jnp.asarray(0.1 * rng.randn(D), jnp.float32)
    return x, s, b, w1, b1, w2, b2


def test_fwd_matches_reference_f32(args):
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(chan_ff_block(*args))
    want = np.asarray(chan_ff_reference(*args))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fwd_matches_reference_bf16(args):
    x, *rest = args
    xb = x.astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(chan_ff_block(xb, *rest), np.float32)
    want = np.asarray(chan_ff_reference(xb, *rest), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_grads_match_reference(args):
    """Custom VJP vs autodiff of the matching-semantics XLA reference."""
    def loss_k(*a):
        y = chan_ff_block(*a)
        return jnp.sum(jnp.square(y.astype(jnp.float32)) * 1e-2)

    def loss_r(*a):
        y = chan_ff_reference(*a)
        return jnp.sum(jnp.square(y.astype(jnp.float32)) * 1e-2)

    with pltpu.force_tpu_interpret_mode():  # bwd kernel traces under grad
        gk = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    names = ["x", "ln_scale", "ln_bias", "w1", "b1", "w2", "b2"]
    for n, a_, b_ in zip(names, gk, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=n)


def test_mixer_fused_param_tree_and_values():
    """fuse_chanff must not change the parameter tree (paths, shapes, inits)
    and must match the unfused forward at bf16 tolerance."""
    from pips_tpu.models.mixer import MLPMixer

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(64, 8, 96), jnp.bfloat16)
    kw = dict(S=8, input_dim=96, dim=128, output_dim=16, depth=2,
              dtype=jnp.bfloat16)
    m0 = MLPMixer(**kw, fuse_chanff=False)
    m1 = MLPMixer(**kw, fuse_chanff=True)
    p0 = m0.init(jax.random.PRNGKey(3), x)
    p1 = m1.init(jax.random.PRNGKey(3), x)

    f0 = jax.tree_util.tree_flatten_with_path(p0)[0]
    f1 = jax.tree_util.tree_flatten_with_path(p1)[0]
    assert [k for k, _ in f0] == [k for k, _ in f1]
    for (k, a_), (_, b_) in zip(f0, f1):
        np.testing.assert_array_equal(np.asarray(a_), np.asarray(b_),
                                      err_msg=str(k))

    y0 = np.asarray(m0.apply(p0, x), np.float32)
    with pltpu.force_tpu_interpret_mode():
        y1 = np.asarray(m1.apply(p1, x), np.float32)
    np.testing.assert_allclose(y0, y1, rtol=5e-2, atol=5e-2)


def test_unaligned_rows_pad_and_match(args):
    """R not a multiple of 128 (e.g. eval-time N) pads with zero rows instead
    of falling back to one giant (R, F) tile that blows the VMEM cap; fwd and
    ALL grads must match the reference exactly as in the aligned case."""
    x, s, b, w1, b1, w2, b2 = args
    xu = jnp.concatenate([x, x[:44]])  # 300 = 2*128 + 44, unaligned
    a = (xu, s, b, w1, b1, w2, b2)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(chan_ff_block(*a))
    want = np.asarray(chan_ff_reference(*a))
    assert got.shape == (300, x.shape[1])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def loss_k(*aa):
        return jnp.sum(jnp.square(chan_ff_block(*aa).astype(jnp.float32)) * 1e-2)

    def loss_r(*aa):
        return jnp.sum(jnp.square(chan_ff_reference(*aa).astype(jnp.float32)) * 1e-2)

    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_k, argnums=tuple(range(7)))(*a)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(*a)
    for n, a_, b_ in zip(["x", "ln_scale", "ln_bias", "w1", "b1", "w2", "b2"],
                         gk, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=n)
