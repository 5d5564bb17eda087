"""Fused channel-FF mixer block for TPU (the train/inference hot loop).

One MLP-Mixer channel block is ``y = x + fc2(gelu(fc1(LN(x))))`` on (R, D)
rows (reference ``nets/pips.py:93-123`` PreNormResidual+FeedForward). As
separate XLA ops this costs 4 intermediate HBM round-trips (ln_out, fc1_out,
gelu_out, fc2_out) plus ~10 kernel launches per block — at PIPs scale
(R = B*N*S ~ 1k-16k rows, D=512, F=2048, 12 blocks x iters) the step is
launch/bandwidth-bound, not MXU-bound (bf16 vs f32 train steps measured
within 5% of each other before this kernel).

``chan_ff_block`` fuses the whole block into one Pallas kernel (forward) and
one kernel for the backward (custom VJP; activations recomputed in-kernel
from x, so nothing but x is saved between fwd and bwd): x tiles stream
through VMEM, weights stay VMEM-resident across row tiles, and only x/y/dy
ever touch HBM.

Numerics: LN statistics and normalization in f32 (matching
``flax.nn.LayerNorm(epsilon=1e-5, dtype=f32)``), matmuls in the input dtype
(bf16 on the mixed-precision path) with the same value layout as
``nn.Dense(dtype=...)``, exact erf GELU. Weight gradients accumulate in f32.
"""

from __future__ import annotations

import contextlib
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT2 = math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)

# Mosaic has no erf lowering; this is XLA's own f32 rational approximation
# (xla/client/lib/math.cc ErfImpl32): erf(x) ~= x * P(x^2)/Q(x^2), x in [-4,4].
_ERF_ALPHA = (-2.72614225801306e-10, 2.77068142495902e-08,
              -2.10102402082508e-06, -5.69250639462346e-05,
              -7.34990630326855e-04, -2.95459980854025e-03,
              -1.60960333262415e-02)
_ERF_BETA = (-1.45660718464996e-05, -2.13374055278905e-04,
             -1.68282697438203e-03, -7.37332916720468e-03,
             -1.42647390514189e-02)


# Plain pallas interpreter (pure jax ops, NOT pltpu.force_tpu_interpret_mode's
# io_callback emulator): the only mode that composes with SPMD partitioning,
# so the multi-device CPU tests and dryrun can run the fused path under a
# sharded jit. Trace-time flag; flip via interpret_mode().
_INTERPRET = False


@contextlib.contextmanager
def interpret_mode():
    global _INTERPRET
    prev = _INTERPRET
    _INTERPRET = True
    try:
        yield
    finally:
        _INTERPRET = prev


def _erf_f32(x):
    x = jnp.clip(x, -4.0, 4.0)
    s = x * x
    p = jnp.float32(_ERF_ALPHA[0])
    for a in _ERF_ALPHA[1:]:
        p = p * s + jnp.float32(a)
    q = jnp.float32(_ERF_BETA[0])
    for b in _ERF_BETA[1:]:
        q = q * s + jnp.float32(b)
    return x * p / q


def _ln_f32(xf, scale, bias, eps=1e-5):
    """Row LayerNorm in f32. xf: (R, D) f32; scale/bias: (1, D) f32."""
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=1, keepdims=True) - jnp.square(mu)
    rsig = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    xn = (xf - mu) * rsig
    return xn, rsig, xn * scale + bias


def _gelu_f32(a):
    return 0.5 * a * (1.0 + _erf_f32(a / _SQRT2))


def _chanff_fwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       y_ref, *, cdtype):
    xf = x_ref[...].astype(jnp.float32)
    _, _, xa = _ln_f32(xf, g_ref[...], b_ref[...])
    a1 = jax.lax.dot_general(
        xa.astype(cdtype), w1_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    a1 = a1 + b1_ref[...]
    g1 = _gelu_f32(a1)
    o = jax.lax.dot_general(
        g1.astype(cdtype), w2_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o = o + b2_ref[...]
    y_ref[...] = (xf + o).astype(y_ref.dtype)


def _chanff_bwd_kernel(x_ref, dy_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                       dx_ref, dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref,
                       db2_ref, *, cdtype):
    """Recompute forward activations in VMEM, emit all grads.

    Weight/LN grads accumulate in f32 across row-tile grid steps (output
    blocks revisit the same index)."""
    r = pl.program_id(0)

    xf = x_ref[...].astype(jnp.float32)
    xn, rsig, xa = _ln_f32(xf, g_ref[...], b_ref[...])
    xa_c = xa.astype(cdtype)
    a1 = jax.lax.dot_general(xa_c, w1_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    a1 = a1 + b1_ref[...]
    g1 = _gelu_f32(a1)
    g1_c = g1.astype(cdtype)

    dy = dy_ref[...].astype(jnp.float32)
    dy_c = dy.astype(cdtype)

    # fc2 backward: o = g1 @ w2 + b2
    dg1 = jax.lax.dot_general(dy_c, w2_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # gelu'(a) = Phi(a) + a * phi(a)
    phi = jnp.exp(-0.5 * jnp.square(a1)) * _INV_SQRT2PI
    da1 = dg1 * (0.5 * (1.0 + _erf_f32(a1 / _SQRT2)) + a1 * phi)
    da1_c = da1.astype(cdtype)

    # fc1 backward
    dxa = jax.lax.dot_general(da1_c, w1_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    # LN backward (affine then normalize)
    dxn = dxa * g_ref[...]
    m1 = jnp.mean(dxn, axis=1, keepdims=True)
    m2 = jnp.mean(dxn * xn, axis=1, keepdims=True)
    dxf = rsig * (dxn - m1 - xn * m2)
    dx_ref[...] = (dy + dxf).astype(dx_ref.dtype)

    # parameter grads: f32 accumulation across row tiles
    @pl.when(r == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dg_ref[...] += jnp.sum(dxa * xn, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dxa, axis=0, keepdims=True)
    dw1_ref[...] += jax.lax.dot_general(
        xa_c, da1_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(da1, axis=0, keepdims=True)
    dw2_ref[...] += jax.lax.dot_general(
        g1_c, dy_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(dy, axis=0, keepdims=True)


def _row_tile(R: int) -> int:
    # (TR, F) f32 intermediates must fit Mosaic's ~16MB scoped-VMEM stack;
    # TR=256 keeps the bwd kernel's live set ~10MB while the MXU still gets
    # full-height tiles. Callers pad R to a multiple of 128 first (_pad_rows),
    # so a tile is always found — never fall back to TR=R, whose (R, F) f32
    # intermediates blow the VMEM cap at large unaligned R (e.g. eval N=4800).
    for tr in (256, 128):
        if R % tr == 0:
            return tr
    raise ValueError(f"row count {R} not 128-aligned; pad with _pad_rows first")


def _padded_rows(R: int) -> int:
    return -(-R // 128) * 128


def _pad_rows(a, Rp: int):
    # Zero rows are safe: LN of a zero row is finite (var=0 -> rsqrt(eps)),
    # and in the backward the padded dy rows are zero, so every weight-grad
    # accumulator term (dxa, da1, dy) vanishes on them.
    R = a.shape[0]
    return a if Rp == R else jnp.pad(a, ((0, Rp - R), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def chan_ff_block(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """Fused y = x + fc2(gelu(fc1(LN(x)))). x: (R, D); returns (R, D) in
    x.dtype. Weights in any float dtype; compute dtype follows x."""
    y, _ = _chanff_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2)
    return y


def _prep(x, ln_scale, ln_bias, w1, b1, w2, b2):
    R, D = x.shape
    F = w1.shape[1]
    cdtype = x.dtype
    args = (
        ln_scale.astype(jnp.float32).reshape(1, D),
        ln_bias.astype(jnp.float32).reshape(1, D),
        w1.astype(cdtype),
        b1.astype(jnp.float32).reshape(1, F),
        w2.astype(cdtype),
        b2.astype(jnp.float32).reshape(1, D),
    )
    return R, D, F, cdtype, args


def _chanff_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2):
    R, D, F, cdtype, (g, b, w1c, b1r, w2c, b2r) = _prep(
        x, ln_scale, ln_bias, w1, b1, w2, b2)
    Rp = _padded_rows(R)
    xp = _pad_rows(x, Rp)
    TR = _row_tile(Rp)
    const = lambda r: (0, 0)  # noqa: E731 — weights resident across tiles
    y = pl.pallas_call(
        functools.partial(_chanff_fwd_kernel, cdtype=cdtype),
        grid=(Rp // TR,),
        in_specs=[
            pl.BlockSpec((TR, D), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, F), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((F, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, D), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, D), x.dtype),
        interpret=_INTERPRET,
    )(xp, g, b, w1c, b1r, w2c, b2r)
    if Rp != R:
        y = y[:R]
    return y, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _chanff_bwd(res, dy):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    R, D, F, cdtype, (g, b, w1c, b1r, w2c, _) = _prep(
        x, ln_scale, ln_bias, w1, b1, w2, b2)
    Rp = _padded_rows(R)
    xp = _pad_rows(x, Rp)
    TR = _row_tile(Rp)
    const = lambda r: (0, 0)  # noqa: E731
    dx, dg, db, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_chanff_bwd_kernel, cdtype=cdtype),
        grid=(Rp // TR,),
        in_specs=[
            pl.BlockSpec((TR, D), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, D), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, F), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((F, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TR, D), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, F), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((F, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rp, D), x.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((F, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        # just above the bwd working set at TR=256 (~19MB); a larger program-
        # wide VMEM reservation starves OTHER fusions' tiling — measured 7x
        # slowdown of encoder instance-norm reduces with a 96MB limit here
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=24 * 2**20),
        interpret=_INTERPRET,
    )(xp, _pad_rows(dy.astype(x.dtype), Rp), g, b, w1c, b1r, w2c)
    if Rp != R:
        dx = dx[:R]
    return (dx,
            dg.reshape(ln_scale.shape).astype(ln_scale.dtype),
            db.reshape(ln_bias.shape).astype(ln_bias.dtype),
            dw1.astype(w1.dtype),
            db1.reshape(b1.shape).astype(b1.dtype),
            dw2.astype(w2.dtype),
            db2.reshape(b2.shape).astype(b2.dtype))


chan_ff_block.defvjp(_chanff_fwd, _chanff_bwd)


def chan_ff_reference(x, ln_scale, ln_bias, w1, b1, w2, b2, dtype=None):
    """Plain-XLA equivalent (flax LayerNorm(f32) + Dense(dtype) semantics);
    used for testing and as the non-TPU fallback."""
    cdtype = dtype or x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    xn = (xf - mu) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)
    xa = xn * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    a1 = xa.astype(cdtype) @ w1.astype(cdtype) + b1.astype(jnp.float32)
    g1 = 0.5 * a1.astype(jnp.float32) * (
        1.0 + jax.lax.erf(a1.astype(jnp.float32) / _SQRT2))
    o = g1.astype(cdtype) @ w2.astype(cdtype) + b2.astype(jnp.float32)
    return (xf + o).astype(x.dtype)
