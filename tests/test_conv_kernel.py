"""Fused implicit-im2col conv kernel (kernels/conv_pallas.py).

Plain-interpreter mode on CPU (composes with jit and sharding); compiled on
TPU. The kernel accumulates in f32 like XLA's conv, so tolerances are tight
in f32 and bf16-level in bf16. Scope is the encoder stage-1 shape family:
C_in == 64, C_out == 64, even W.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pips_tpu.kernels.conv_pallas import _ref_conv, conv3x3_same, interpret_mode


@pytest.fixture
def args():
    rng = np.random.RandomState(0)
    B, H, W, C, O = 2, 8, 16, 64, 64
    x = jnp.asarray(rng.randn(B, H, W, C) * 0.5, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, C, O) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(O) * 0.1, jnp.float32)
    return x, w, b


def test_fwd_matches_xla_f32(args):
    x, w, b = args
    with interpret_mode():
        y = np.asarray(conv3x3_same(x, w, b))
    want = np.asarray(_ref_conv(x, w, b))
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-5)


def test_fwd_matches_xla_bf16(args):
    x, w, b = args
    xb = x.astype(jnp.bfloat16)
    with interpret_mode():
        y = np.asarray(conv3x3_same(xb, w, b), np.float32)
    want = np.asarray(_ref_conv(xb, w.astype(jnp.bfloat16), b), np.float32)
    np.testing.assert_allclose(y, want, rtol=3e-2, atol=3e-2)


def test_grads_match_xla(args):
    """custom VJP (pallas dgrad via rotated weights + XLA wgrad) vs autodiff
    of the plain conv."""
    x, w, b = args

    def loss_k(x, w, b):
        return jnp.sum(jnp.square(conv3x3_same(x, w, b)) * 1e-2)

    def loss_r(x, w, b):
        return jnp.sum(jnp.square(_ref_conv(x, w, b)) * 1e-2)

    with interpret_mode():
        gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w, b)
    for n, a, bb in zip(["x", "w", "b"], gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-4, atol=2e-4, err_msg=n)


def test_odd_height_tile():
    """H not divisible by the preferred row tiles falls back to a smaller
    tile, not an error."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 6, 16, 64) * 0.5, jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.1, jnp.float32)
    b = jnp.zeros((64,), jnp.float32)
    with interpret_mode():
        y = np.asarray(conv3x3_same(x, w, b))
    np.testing.assert_allclose(y, np.asarray(_ref_conv(x, w, b)),
                               rtol=1e-5, atol=1e-5)


def test_instance_norm_s2d_matches_plain():
    """Pair-combined instance norm on the W-s2d layout equals the plain
    instance norm on the un-s2d view, forward and VJP."""
    from pips_tpu.models.encoder import instance_norm, instance_norm_s2d

    rng = np.random.RandomState(5)
    B, H, W, C = 2, 6, 12, 8
    x = jnp.asarray(rng.randn(B, H, W, C) * 2.0 + 0.5, jnp.float32)
    x2 = x.reshape(B, H, W // 2, 2 * C)
    y = np.asarray(instance_norm(x))
    y2 = np.asarray(instance_norm_s2d(x2)).reshape(B, H, W, C)
    np.testing.assert_allclose(y2, y, rtol=1e-5, atol=1e-5)

    g = jax.grad(lambda t: jnp.sum(jnp.sin(instance_norm(t))))(x)
    g2 = jax.grad(lambda t: jnp.sum(jnp.sin(instance_norm_s2d(t))))(x2)
    np.testing.assert_allclose(np.asarray(g2).reshape(B, H, W, C),
                               np.asarray(g), rtol=1e-5, atol=1e-5)


def test_residual_block_s2d_matches_plain_bf16():
    """The stage-1 W-s2d block (packed-kernel convs + pair-combined IN, all
    in the 128-lane layout) is numerically equivalent to the plain block in
    the same dtype, with an identical param tree, and its param gradients
    match autodiff of the plain block."""
    from pips_tpu.models.encoder import ResidualBlock

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 16, 64) * 0.5, jnp.float32)
    b_s2d = ResidualBlock(64, 1, dtype=jnp.bfloat16, s2d=True)
    b_ref = ResidualBlock(64, 1, dtype=jnp.bfloat16, s2d=False)
    p = b_s2d.init(jax.random.PRNGKey(3), x)
    p_ref = b_ref.init(jax.random.PRNGKey(3), x)
    f0 = jax.tree_util.tree_flatten_with_path(p)[0]
    f1 = jax.tree_util.tree_flatten_with_path(p_ref)[0]
    assert [k for k, _ in f0] == [k for k, _ in f1]
    for (k, a), (_, b) in zip(f0, f1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(k))

    y = np.asarray(b_s2d.apply(p, x), np.float32)
    want = np.asarray(b_ref.apply(p_ref, x), np.float32)
    np.testing.assert_allclose(y, want, rtol=2e-2, atol=2e-2)

    def loss(m, pp, xx):
        return jnp.sum(jnp.square(m.apply(pp, xx).astype(jnp.float32))) * 1e-2

    g = jax.grad(lambda pp: loss(b_s2d, pp, x))(p)
    g_ref = jax.grad(lambda pp: loss(b_ref, pp, x))(p_ref)
    for (k, a), (_, b) in zip(jax.tree_util.tree_flatten_with_path(g)[0],
                              jax.tree_util.tree_flatten_with_path(g_ref)[0]):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-2, atol=5e-2, err_msg=str(k))


def test_encoder_fuse_conv3_param_tree_and_values():
    """fuse_conv3 keeps the parameter tree identical (paths, shapes, inits)
    and matches the unfused encoder at tolerance. Stage dims chosen so
    stage 1 hits the kernel's (C=64 -> 64) scope."""
    from pips_tpu.models.encoder import BasicEncoder

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 32, 48, 3) * 0.5, jnp.float32)
    kw = dict(output_dim=32, stride=8, stage_dims=(64, 12, 16, 16))
    e0 = BasicEncoder(**kw)
    e1 = BasicEncoder(**kw, fuse_conv3=True)
    p0 = e0.init(jax.random.PRNGKey(7), x)
    p1 = e1.init(jax.random.PRNGKey(7), x)

    f0 = jax.tree_util.tree_flatten_with_path(p0)[0]
    f1 = jax.tree_util.tree_flatten_with_path(p1)[0]
    assert [k for k, _ in f0] == [k for k, _ in f1]
    for (k, a), (_, b) in zip(f0, f1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(k))

    y0 = np.asarray(e0.apply(p0, x))
    with interpret_mode():
        y1 = np.asarray(e1.apply(p1, x))
    np.testing.assert_allclose(y0, y1, rtol=1e-4, atol=1e-4)
