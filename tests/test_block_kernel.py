"""Stage-granularity fused residual block (kernels/block_pallas.py).

Interpret mode on CPU; the whole block — conv3+IN+relu+conv3+IN+relu+add
(reference ``nets/pips.py:131-181``) — against plain-XLA reference math,
forward and the full hand-written backward (one custom-VJP boundary).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pips_tpu.kernels.block_pallas import interpret_mode, res_block64


def ref_block(x, w1, b1, w2, b2, eps=1e-5):
    def conv(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b

    def IN(x):
        m = jnp.mean(x, axis=(1, 2), keepdims=True)
        v = jnp.maximum(jnp.mean(x * x, axis=(1, 2), keepdims=True) - m * m, 0.0)
        return (x - m) * jax.lax.rsqrt(v + eps)

    y = jax.nn.relu(IN(conv(x, w1, b1)))
    y = jax.nn.relu(IN(conv(y, w2, b2)))
    return jax.nn.relu(x + y)


@pytest.fixture
def args():
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 16, 32, 64
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    w1 = jnp.asarray(rng.randn(3, 3, C, C) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(3, 3, C, C) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


def test_block_fwd_matches_reference(args):
    with interpret_mode():
        out = res_block64(*args)
    ref = ref_block(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_block_bwd_matches_autodiff(args):
    def loss_k(a):
        return jnp.sum(jnp.sin(res_block64(*a)))

    def loss_r(a):
        return jnp.sum(jnp.sin(ref_block(*a)))

    with interpret_mode():
        gk = jax.grad(loss_k)(args)
    gr = jax.grad(loss_r)(args)
    for a, b, name in zip(gk, gr, ["dx", "dw1", "db1", "dw2", "db2"]):
        d = float(jnp.abs(a - b).max())
        scale = max(float(jnp.abs(b).max()), 1.0)
        assert d < 3e-3 * scale, (name, d, scale)
    # instance norm makes the block invariant to conv bias: both db ~ 0
    assert float(jnp.abs(gr[2]).max()) < 1e-4
    assert float(jnp.abs(gk[2]).max()) < 1e-4
