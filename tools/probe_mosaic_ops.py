"""Probe: which Mosaic lowerings exist for the stem-wgrad kernel candidates.

The planned kernel builds per-tap patch slices in VMEM and contracts them
against dy. Three uncertain Mosaic ops gate the design:
  A. dot_general with TWO contracting dims on 3D operands
     (TH,Wo,6) x (TH,Wo,64) -> (6,64)
  B. minor-dim SPLIT reshape (TH, Wo*6) -> (TH*Wo, 6)
  C. lane-dim concat of 28 (TR,6) tiles -> (TR,168)
Each probe compiles + checks numerics vs plain XLA. Run on the real TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_mosaic_ops.py
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, Wo, C, O = 24, 256, 6, 64
rng = np.random.RandomState(0)
a0 = jnp.asarray(rng.rand(TH, Wo, C) - 0.5, jnp.bfloat16)
b0 = jnp.asarray(rng.rand(TH, Wo, O) - 0.5, jnp.bfloat16)
af = jnp.asarray(a0, jnp.float32)
bf = jnp.asarray(b0, jnp.float32)


def check(name, fn, want):
    try:
        got = jax.jit(fn)(a0, b0)
        got = jax.device_get(got).astype(np.float32)
        err = float(np.max(np.abs(got - want)))
        print(f"{name}: OK max|err|={err:.4f}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")


# --- A: two contracting dims ------------------------------------------------
def kern_a(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32)


def probe_a(a, b):
    return pl.pallas_call(
        kern_a,
        out_shape=jax.ShapeDtypeStruct((C, O), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)


want_a = np.einsum("hwc,hwo->co", af, bf)
check("A dot2contract", probe_a, want_a)


# --- A2: same but contract after in-kernel 2D collapse of BOTH via reshape --
def kern_a2(a_ref, b_ref, o_ref):
    a2 = a_ref[...].reshape(TH * Wo, C)
    b2 = b_ref[...].reshape(TH * Wo, O)
    o_ref[...] = jax.lax.dot_general(
        a2, b2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def probe_a2(a, b):
    return pl.pallas_call(
        kern_a2,
        out_shape=jax.ShapeDtypeStruct((C, O), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)


check("A2 collapse3d->2d", probe_a2, want_a)


# --- B: minor-dim split reshape (TH, Wo*C) -> (TH*Wo, C) --------------------
def kern_b(a_ref, b_ref, o_ref):
    a2 = a_ref[...].reshape(TH * Wo, C)  # split minor 1536 -> (256, 6)
    b2 = b_ref[...]
    o_ref[...] = jax.lax.dot_general(
        a2, b2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def probe_b(a, b):
    a_fold = a.reshape(TH, Wo * C)
    b_fold = b.reshape(TH * Wo, O)
    return pl.pallas_call(
        kern_b,
        out_shape=jax.ShapeDtypeStruct((C, O), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a_fold, b_fold)


check("B minorsplit", probe_b, want_a)


# --- C: lane concat of 28 (TR, C) tiles -> (TR, 168) + one dot --------------
def kern_c(a_ref, b_ref, o_ref):
    parts = [a_ref[...][:, i % Wo, :] for i in range(28)]  # (TH, C) each
    p = jnp.concatenate(parts, axis=-1)  # (TH, 168)
    o_ref[...] = jax.lax.dot_general(
        p, b_ref[...][:, 0, :], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def probe_c(a, b):
    return pl.pallas_call(
        kern_c,
        out_shape=jax.ShapeDtypeStruct((28 * C, O), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)


want_c = np.concatenate(
    [np.einsum("hc,ho->co", af[:, i % Wo], bf[:, 0]) for i in range(28)], 0)
check("C laneconcat", probe_c, want_c)
