"""Mosaic feasibility probes for a fused mixer-block kernel.

Checks (on the real TPU) that the remote Mosaic compiler accepts the
primitives the fused DeltaBlock kernel needs: erf (exact GELU), f32 LN
row-stats over lanes, static lane slices of a (TN, S*D) tile, multi-block
weight streaming via a grid axis, and VMEM accumulation.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TN, S, D, F = 128, 8, 512, 2048


def probe(name, fn):
    try:
        out = jax.block_until_ready(fn())
        val = float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
        print(f"{name}: OK sum={val:.4f}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
        return False


rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(TN, S * D), jnp.bfloat16)
w1 = jnp.asarray(rng.randn(12, D, F) * 0.02, jnp.bfloat16)


def k_erf(x_ref, o_ref):
    xf = x_ref[...].astype(jnp.float32)
    o_ref[...] = (0.5 * xf * (1.0 + jax.lax.erf(xf / np.sqrt(2.0)))).astype(
        jnp.bfloat16)


def k_ln_slice(x_ref, o_ref):
    # static lane slice + row LN in f32
    xs = x_ref[:, 0:D].astype(jnp.float32)
    mu = jnp.mean(xs, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xs), axis=1, keepdims=True) - jnp.square(mu)
    o_ref[...] = ((xs - mu) * jax.lax.rsqrt(var + 1e-5)).astype(jnp.bfloat16)


def k_block_stream(x_ref, w_ref, o_ref):
    # grid over 12 blocks; o accumulates (same output block each step)
    b = pl.program_id(0)
    xs = x_ref[:, 0:D]
    h = jax.lax.dot_general(xs, w_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

    @pl.when(b == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += h.astype(o_ref.dtype)


probe("erf", lambda: pl.pallas_call(
    k_erf, out_shape=jax.ShapeDtypeStruct((TN, S * D), jnp.bfloat16))(x))

probe("ln_slice", lambda: pl.pallas_call(
    k_ln_slice, out_shape=jax.ShapeDtypeStruct((TN, D), jnp.bfloat16))(x))

probe("block_stream_accum", lambda: pl.pallas_call(
    k_block_stream,
    grid=(12,),
    in_specs=[pl.BlockSpec((TN, S * D), lambda b: (0, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((1, D, F), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((TN, F), lambda b: (0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((TN, F), jnp.float32))(x, w1))
