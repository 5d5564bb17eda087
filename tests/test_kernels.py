"""Corr kernels vs the reference-semantics JAX path.

The Pallas kernel runs in interpreter mode on CPU (tests) and compiled on TPU
(bench); the one-hot variant is plain XLA and exact everywhere.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pips_tpu.kernels.corr_pallas import sample_corr_onehot
from pips_tpu.ops.corr import (build_fmap_pyramid, corr_pyramid, fused_corr_sample,
                               sample_corr_pyramid)


@pytest.fixture
def setup(rng):
    B, S, N, C, H, W, L = 1, 2, 8, 16, 24, 32, 3
    fmaps = rng.randn(B, S, H, W, C).astype(np.float32)
    targets = rng.randn(B, S, N, C).astype(np.float32)
    coords = np.stack([rng.uniform(-4, W + 3, (B, S, N)),
                       rng.uniform(-4, H + 3, (B, S, N))], axis=-1).astype(np.float32)
    return fmaps, targets, coords


def test_onehot_matches_reference_sampling(setup):
    fmaps, targets, coords = setup
    pyr = build_fmap_pyramid(jnp.asarray(fmaps), 3)
    corrs = corr_pyramid(pyr, jnp.asarray(targets))
    want = np.asarray(sample_corr_pyramid(corrs, jnp.asarray(coords), radius=3))
    got = np.asarray(sample_corr_onehot(corrs, jnp.asarray(coords), radius=3))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_kernel_matches_fused(setup, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    from pips_tpu.kernels import corr_pallas

    fmaps, targets, coords = setup
    pyr = build_fmap_pyramid(jnp.asarray(fmaps), 3)
    want = np.asarray(fused_corr_sample(pyr, jnp.asarray(targets),
                                        jnp.asarray(coords), radius=3))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(corr_pallas.corr_sample_pallas(
            pyr, jnp.asarray(targets), jnp.asarray(coords), radius=3, tile_n=8))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
