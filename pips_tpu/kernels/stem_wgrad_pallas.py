"""Patch-free Pallas weight-gradient for the encoder stem conv — a measured
NEGATIVE result, kept (like kernels/conv_pallas.py) so the route isn't
re-derived: at B=1 384x512 bf16 the fwd+wgrad chain runs 967 us vs XLA's
857 us and vs 249 us for the pure-XLA row-tap-unfold stem that superseded
both (models/encoder.py _StemInner bf16 branch; tools/profile_stem_wgrad.py
reproduces all three). The in-VMEM patch build loses because each of the 28
taps needs a (TH, Wo, 6) -> (TH*Wo, 6) collapse whose 6-lane layout
relayouts dominate the tiny M=6 MXU dots they feed.

Why it was tried: the stem was the one conv XLA's autodiff handled
pathologically before the x7 rewrite. Its
dgrad-w strategy puts M = C_in = 6 on the MXU sublanes and burns ~8x the
minimal FLOPs (r3 xplane trace: 1.0 ms/step at 8.5 TF/s inside the 31 ms
train step; reference stem is ``nets/pips.py:161-183``'s first conv). Every
XLA-level im2col rewrite LOSES because patch materialization in HBM costs
more than it saves (tools/profile_stem_im2col.py: slice+concat 8.7 ms,
parity-split 2.1, dilated_patches 1.5 vs the 0.97 ms saved). The only way
to win is to never materialize patches in HBM: build them per-tile in VMEM.

Design (Mosaic-verified primitives only, tools/probe_mosaic_ops.py):
  - XLA prep folds the 7 row-taps into channels:
        x7[b, h, w', ky*6 + c] = x2[b, 2*h + ky, w', c]
    (x2 is the stem's W-only-s2d input, (B, H+6, (W+6)/2, 6)). One fused
    strided-slice+concat pass, ~13 MB padded write at bench scale. Row
    tiles of x7 then need NO halo, so plain BlockSpec tiling works
    (overlapping halo'd blocks are not expressible via BlockSpec index
    maps, and the multi-dim-contraction / lane-concat alternatives crash
    the remote Mosaic compiler — probes A and C).
  - Kernel, grid (B, Ho/TH): for each of the 28 taps, lane-slice
    (TH, Wo, 6), collapse major dims to (TH*Wo, 6) (probe A2: the one
    reshape Mosaic accepts here), and contract rows against the collapsed
    dy tile (TH*Wo, 64) on the MXU -> (6, 64) f32, accumulated into a
    (28, 6, 64) output revisited across the grid (mixer-kernel pattern).

The fused chain-rule wrapper `stem_conv_s2d` keeps the FORWARD as the plain
XLA conv (so epilogue fusion with instance-norm survives — the r3 conv3
Pallas kernel lost end-to-end precisely by breaking that fusion) and swaps
only the weight-gradient; the input cotangent is returned as zeros because
the stem input is the network input (no upstream consumers; XLA DCEs it).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Same trace-time interpret flag discipline as mixer_pallas: plain-jax
# interpreter composes with SPMD partitioning on CPU test meshes.
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


def _wgrad_kernel(x7_ref, dy_ref, dk_ref, *, TH, Wo, KY, KX, C):
    """x7: (1, TH, Wp, KY*C); dy: (1, TH, Wo, O); dk: (KY*KX, C, O) f32."""
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    dy2 = dy_ref[0].reshape(TH * Wo, dy_ref.shape[-1])
    for ky in range(KY):
        for kx in range(KX):
            s = x7_ref[0, :, kx:kx + Wo, ky * C:(ky + 1) * C]
            m = jax.lax.dot_general(
                s.reshape(TH * Wo, C), dy2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            t = ky * KX + kx

            @pl.when(first)
            def _():
                dk_ref[t] = m

            @pl.when(jnp.logical_not(first))
            def _():
                dk_ref[t] += m


def _pick_tile(Ho: int) -> int:
    for th in (24, 16, 32, 12, 8):
        if Ho % th == 0:
            return th
    return 0


def stem_wgrad(x2, dy, KY: int = 7, KX: int = 4):
    """dk2 (KY, KX, C, O) f32 for the stride-(2,1) VALID stem conv.

    x2: (B, Hp, Wp, C) the W-s2d stem input (Hp = 2*Ho + KY - 1).
    dy: (B, Ho, Wo, O) output cotangent. Returns None if the shape doesn't
    tile (caller falls back to XLA autodiff).
    """
    B, Hp, Wp, C = x2.shape
    _, Ho, Wo, O = dy.shape
    TH = _pick_tile(Ho)
    if TH == 0 or Wo + KX - 1 > Wp or Hp < 2 * (Ho - 1) + KY + 1 - 1:
        return None
    # fold row taps into lanes: x7[b, h, w', ky*C+c] = x2[b, 2h+ky, w', c]
    x7 = jnp.concatenate(
        [x2[:, ky:ky + 2 * Ho:2] for ky in range(KY)], axis=-1)
    dk = pl.pallas_call(
        functools.partial(_wgrad_kernel, TH=TH, Wo=Wo, KY=KY, KX=KX, C=C),
        grid=(B, Ho // TH),
        in_specs=[
            pl.BlockSpec((1, TH, Wp, KY * C), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, Wo, O), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((KY * KX, C, O), lambda b, h: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((KY * KX, C, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=12 * 2 ** 20),
        interpret=_INTERPRET,
    )(x7, dy)
    return dk.reshape(KY, KX, C, O)


@jax.custom_vjp
def stem_conv_s2d(x2, k2):
    """stride-(2,1) VALID NHWC conv with the Pallas weight-grad.

    Forward is the untouched XLA conv (keeps IN-stat epilogue fusion);
    backward returns ZERO input-cotangent by contract — only valid where
    x2 derives from non-differentiated network inputs (the stem).
    """
    return jax.lax.conv_general_dilated(
        x2, k2, (2, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _stem_conv_fwd(x2, k2):
    return stem_conv_s2d(x2, k2), (x2, k2)


def _stem_conv_bwd(res, dy):
    x2, k2 = res
    KY, KX = k2.shape[0], k2.shape[1]
    dk = stem_wgrad(x2, dy, KY=KY, KX=KX)
    if dk is None:
        # untileable shape: plain XLA wgrad
        _, vjp = jax.vjp(lambda k: jax.lax.conv_general_dilated(
            x2, k, (2, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), k2)
        dk, = vjp(dy)
    return jnp.zeros_like(x2), dk.astype(k2.dtype)


stem_conv_s2d.defvjp(_stem_conv_fwd, _stem_conv_bwd)


def stem_wgrad_supported(Ho: int, Wo: int, Wp: int, KX: int = 4) -> bool:
    """Static tileability check callers use to choose the conv path."""
    return _pick_tile(Ho) != 0 and Wo + KX - 1 <= Wp
