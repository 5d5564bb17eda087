"""Optimized encoder kernels == naive formulations."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pips_tpu.models.encoder import StemConv, instance_norm


def test_stem_spd_matches_direct_conv(rng):
    B, H, W, C, O = 2, 64, 96, 3, 16
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    stem = StemConv(O)
    params = stem.init(jax.random.PRNGKey(0), x)
    got = stem.apply(params, x)

    k = params["params"]["Conv_0"]["kernel"]
    b = params["params"]["Conv_0"]["bias"]
    want = jax.lax.conv_general_dilated(
        x, k, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    assert got.shape == want.shape == (B, H // 2, W // 2, O)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    # odd sizes take the direct path
    x_odd = jnp.asarray(rng.randn(B, H + 1, W + 1, C), jnp.float32)
    got_odd = stem.apply(params, x_odd)
    assert got_odd.shape == (B, (H + 1 + 1) // 2, (W + 1 + 1) // 2, O)


def test_stem_matches_torch_conv(rng):
    B, H, W, C, O = 1, 32, 48, 3, 8
    x = rng.randn(B, H, W, C).astype(np.float32)
    stem = StemConv(O)
    params = stem.init(jax.random.PRNGKey(1), jnp.asarray(x))
    got = np.asarray(stem.apply(params, jnp.asarray(x)))

    k = np.asarray(params["params"]["Conv_0"]["kernel"])  # (7,7,C,O)
    b = np.asarray(params["params"]["Conv_0"]["bias"])
    tw = torch.from_numpy(np.transpose(k, (3, 2, 0, 1)))
    want = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2), tw,
                    torch.from_numpy(b), stride=2, padding=3)
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


def test_instance_norm_matches_torch(rng):
    x = rng.randn(2, 10, 12, 5).astype(np.float32) * 4 + 2
    got = np.asarray(instance_norm(jnp.asarray(x)))
    want = F.instance_norm(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-3, atol=1e-4)


def test_encoder_remat_same_params_and_grads():
    """remat=True keeps the param tree and gradients identical (it only
    changes what is saved for backward)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pips_tpu.models.encoder import BasicEncoder

    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 48, 3), jnp.float32)
    enc = BasicEncoder(output_dim=16, stride=8, stage_dims=(8, 12, 16, 16))
    enc_r = BasicEncoder(output_dim=16, stride=8, stage_dims=(8, 12, 16, 16),
                         remat=True)
    params = enc.init(jax.random.PRNGKey(0), x)
    params_r = enc_r.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(params) == jax.tree.structure(params_r)

    def loss(m, p):
        return jnp.sum(m.apply(p, x) ** 2)

    g = jax.jit(jax.grad(lambda p: loss(enc, p)))(params)
    g_r = jax.jit(jax.grad(lambda p: loss(enc_r, p)))(params)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_r)):
        a, b = np.asarray(a), np.asarray(b)
        # biases feeding instance norm have exactly-zero true grads; their
        # residue is cancellation noise that differs across compilations
        atol = 1e-3 + 1e-5 * np.abs(a).max()
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=atol)


def test_instance_norm_custom_vjp_grads():
    """Hand-derived IN backward == autodiff of the plain formula."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pips_tpu.models.encoder import instance_norm

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 5, 4) * 3 + 1, jnp.float32)

    def plain(x, eps=1e-5):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
            - jnp.square(mean), 0.0)
        return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)

    np.testing.assert_allclose(np.asarray(instance_norm(x)),
                               np.asarray(plain(x)), rtol=1e-6, atol=1e-6)

    def loss_c(x):
        return jnp.sum(jnp.sin(instance_norm(x) * 1.7))

    def loss_p(x):
        return jnp.sum(jnp.sin(plain(x) * 1.7))

    gc = np.asarray(jax.grad(loss_c)(x))
    gp = np.asarray(jax.grad(loss_p)(x))
    np.testing.assert_allclose(gc, gp, rtol=1e-4, atol=1e-5)
