"""Fully-s2d stage-1 pipeline == plain formulations.

The full_s2d encoder path (stem emits W-s2d, layer-1 blocks are s2d_io,
the fusion resize contracts H in-layout, layer2_0 consumes s2d) computes
exactly the same MACs as the plain path via packed kernels with structural
zeros; differences are bf16 rounding / fp reassociation only. Param trees
are identical in every mode (checkpoint compatibility).
"""

import numpy as np

import jax
import jax.numpy as jnp

from pips_tpu.models.encoder import (BasicEncoder, StemConv,
                                     _Conv1S2dDownRaw, _Conv3S2dDownRaw)
from pips_tpu.ops.resize import (resize_bilinear_align_corners,
                                 resize_bilinear_align_corners_s2d)


def _assert_same_tree(p0, p1):
    f0 = jax.tree_util.tree_flatten_with_path(p0)[0]
    f1 = jax.tree_util.tree_flatten_with_path(p1)[0]
    assert [k for k, _ in f0] == [k for k, _ in f1]
    for (k, a), (_, b) in zip(f0, f1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(k))


def test_stem_emit_s2d_matches_plain_bf16():
    rng = np.random.RandomState(0)
    B, H, W, C, O = 2, 32, 48, 3, 16
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    s0 = StemConv(O, dtype=jnp.bfloat16)
    s1 = StemConv(O, dtype=jnp.bfloat16, emit_s2d=True)
    p0 = s0.init(jax.random.PRNGKey(0), x)
    p1 = s1.init(jax.random.PRNGKey(0), x)
    _assert_same_tree(p0, p1)

    want = np.asarray(s0.apply(p0, x), np.float32)
    y2 = s1.apply(p1, x)
    assert y2.shape == (B, H // 2, W // 4, 2 * O)
    got = np.asarray(y2, np.float32).reshape(B, H // 2, W // 2, O)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_s2d_down_convs_match_plain():
    """Packed stride-2 convs consuming the W-s2d layout == plain strided
    convs on the un-s2d view (f32: exact same products, near-exact)."""
    rng = np.random.RandomState(1)
    B, H, W, C, O = 2, 12, 16, 8, 10
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    x2 = x.reshape(B, H, W // 2, 2 * C)

    m3 = _Conv3S2dDownRaw(O)
    p3 = m3.init(jax.random.PRNGKey(1), x2)
    k, b = p3["params"]["kernel"], p3["params"]["bias"]
    want3 = jax.lax.conv_general_dilated(
        x, k, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got3 = m3.apply(p3, x2)
    assert got3.shape == want3.shape == (B, H // 2, W // 2, O)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want3),
                               rtol=1e-5, atol=1e-5)

    m1 = _Conv1S2dDownRaw(O)
    p1 = m1.init(jax.random.PRNGKey(2), x2)
    k, b = p1["params"]["kernel"], p1["params"]["bias"]
    want1 = jax.lax.conv_general_dilated(
        x, k, (2, 2), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got1 = m1.apply(p1, x2)
    assert got1.shape == want1.shape == (B, H // 2, W // 2, O)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1),
                               rtol=1e-5, atol=1e-5)


def test_resize_s2d_matches_plain():
    rng = np.random.RandomState(2)
    B, H, W, C = 2, 12, 16, 6
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    x2 = x.reshape(B, H, W // 2, 2 * C)
    for out_hw in [(3, 4), (5, 7), (H, W), (H, 9), (4, W)]:
        want = np.asarray(resize_bilinear_align_corners(x, out_hw))
        got = np.asarray(resize_bilinear_align_corners_s2d(x2, out_hw))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6,
                                   err_msg=str(out_hw))


def test_encoder_full_s2d_matches_plain_bf16():
    """full_s2d encoder == full_s2d=False encoder in bf16: identical param
    tree, matching outputs, matching param grads (autodiff through the
    packed kernels, pair-combined norms and the s2d resize)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 32, 48, 3) * 0.5, jnp.float32)
    kw = dict(output_dim=32, stride=8, stage_dims=(64, 12, 16, 16),
              dtype=jnp.bfloat16)
    e0 = BasicEncoder(**kw, full_s2d=False)
    e1 = BasicEncoder(**kw, full_s2d=True)
    p0 = e0.init(jax.random.PRNGKey(7), x)
    p1 = e1.init(jax.random.PRNGKey(7), x)
    _assert_same_tree(p0, p1)

    y0 = np.asarray(e0.apply(p0, x), np.float32)
    y1 = np.asarray(e1.apply(p1, x), np.float32)
    assert y0.shape == y1.shape
    np.testing.assert_allclose(y1, y0, rtol=4e-2, atol=4e-2)

    def loss(m, pp):
        return jnp.sum(jnp.square(m.apply(pp, x).astype(jnp.float32))) * 1e-2

    g0 = jax.grad(lambda pp: loss(e0, pp))(p0)
    g1 = jax.grad(lambda pp: loss(e1, pp))(p1)
    for (k, a), (_, b) in zip(jax.tree_util.tree_flatten_with_path(g0)[0],
                              jax.tree_util.tree_flatten_with_path(g1)[0]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        path = "/".join(str(p.key) for p in k)
        if path.endswith("bias") and "conv3" not in path:
            # every conv except the final 1x1 feeds an instance norm, which
            # is shift-invariant: the true bias grad is exactly zero and
            # autodiff leaves formulation-dependent bf16 cancellation noise
            assert np.isfinite(b).all(), path
            continue
        atol = 5e-2 + 5e-2 * np.abs(a).max()
        np.testing.assert_allclose(b, a, rtol=5e-2, atol=atol,
                                   err_msg=path)


def test_encoder_full_s2d_odd_width_falls_back():
    """W % 4 != 0 silently uses the plain path (same results either way)."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 32, 44, 3) * 0.5, jnp.float32)  # 44 % 4 == 0
    x_odd = jnp.asarray(rng.randn(1, 32, 46, 3) * 0.5, jnp.float32)
    kw = dict(output_dim=32, stride=2, stage_dims=(64, 12, 16, 16),
              dtype=jnp.bfloat16, full_s2d=True)
    enc = BasicEncoder(**kw)
    p = enc.init(jax.random.PRNGKey(8), x)
    # the same params apply cleanly at a non-multiple-of-4 width
    y = enc.apply(p, x_odd)
    assert y.shape == (1, 16, 23, 32)
    assert np.isfinite(np.asarray(y, np.float32)).all()
