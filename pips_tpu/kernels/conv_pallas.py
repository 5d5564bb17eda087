"""Fused implicit-im2col 3x3 conv for 64-channel stages (TPU).

Why: XLA's TPU conv strategy issues one MXU contraction pass per kernel tap
with K = C_in lanes. The MXU contracts 128 lanes per pass, so the encoder's
64-channel stage-1 convs run every pass half-empty — measured 52-55 TF/s on
v5e (bf16) while the same-shape 128-channel conv runs at 146 TF/s, and the
time is *invariant* to C_in below 128 (a 32-channel conv costs the same as
64; ``tools/profile_conv_roofline.py``). Explicit im2col at the HLO level
loses even harder: materializing (B*H*W, 9C) patches is pure HBM traffic
(9x the activation volume, measured 21-23 TF/s).

Design: W-only space-to-depth — in NHWC, (H, W, 64) -> (H, W/2, 128) is a
FREE reshape (identical memory layout) — makes both the input lanes and the
output lanes exactly 128-wide. The kernel then computes TWO neighboring
output pixels per matmul row:

    out2[h, w2, a*O+o] = sum_{dy,m,a',c} band[h+dy, w2+m, a'*C+c]
                                         * W[dy, 2m+a'-a-1, c, o]

i.e. patches are 9 lane-aligned (TH*W2, 128) views concatenated to
(TH*W2, 1152), contracted against a (1152, 128) block-structured weight
(50% structural zeros — the even/odd output phases share taps). Relative to
XLA's native conv this trades 2x padded FLOPs for 4x better MXU occupancy
(K and N both full), and HBM traffic stays x once + y once. Mosaic
alignment constraints that shaped this (r3): DMA slices need 8-aligned
second-minor and 128-aligned minor dims, so the halo band is DMA'd from a
(H+2, W2p, 128) padded layout; BlockSpec blocks cannot overlap, hence the
manual halo DMA into scratch.

Scope: 3x3, stride 1, SAME padding, C_in == 64, C_out <= 64, even W —
exactly the encoder's stage-1 residual convs (reference
``nets/pips.py:131-181``). Backward: dx is the same kernel with
spatially-rotated, transposed weights (full-correlation identity); dW falls
back to XLA's wgrad conv, which contracts over B*H*W (dense K) and is
already MXU-efficient (~90 TF/s measured in-model).

Status (r3): DOCUMENTED EXPERIMENT, default OFF. End-to-end the bf16 train
step measured 40.7 ms/step with ``fuse_conv3=True`` vs 32.65 ms without —
the 2x padded FLOPs plus the custom-VJP boundary (it blocks XLA from fusing
the adjacent instance-norm/ReLU into the conv epilogue) cost more than the
lane-occupancy win recovers. Kept (tested, correct, interpret-mode
composable) as the probe for layout side-effects and as the starting point
if a future stage is lane-bound enough to flip the trade.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _conv3x3_kernel(xp_hbm, w_ref, b_ref, out_ref, band, sem, *,
                    TH, W2, C2, O2, T, cdtype):
    """One row-tile of one image, W-s2d layout, double-buffered halo DMA.

    xp_hbm: (B, H+2, W2p, C2) padded s2d input, left in HBM; each grid step
    g waits on the (TH+2)-row band it prefetched at step g-1 and prefetches
    g+1's band into the other buffer (manual double buffering: BlockSpec
    blocks cannot overlap, so the pipelined-input machinery cannot express
    the halo). w_ref: (9*C2, O2) [dy, m, a', c]-major; b_ref: (1, O2);
    out_ref: (1, TH, W2, O2). band: (2, TH+2, W2p, C2); sem: 2 DMA sems.

    The 9 taps run as 9 accumulated single-pass (128-lane) dots rather than
    one concat + wide dot: the lane-concat relayout of 9 tiles measured
    slower than the extra accumulate.
    """
    g = pl.program_id(0)
    G = pl.num_programs(0)

    def start(gi, slot):
        bi = gi // T
        t = gi % T
        pltpu.make_async_copy(
            xp_hbm.at[bi, pl.dslice(t * TH, TH + 2)],
            band.at[slot], sem.at[slot]).start()

    cur = g % 2

    @pl.when(g == 0)
    def _prologue():
        start(0, 0)

    @pl.when(g + 1 < G)
    def _prefetch_next():
        start(g + 1, (g + 1) % 2)

    pltpu.make_async_copy(
        xp_hbm.at[0, pl.dslice(0, TH + 2)],  # shape-only; sem carries identity
        band.at[cur], sem.at[cur]).wait()

    acc = b_ref[...].astype(jnp.float32) * jnp.ones((TH * W2, 1), jnp.float32)
    for dy in range(3):
        for m in range(3):
            v = band[cur, dy:dy + TH, m:m + W2, :]  # static slices, 128 lanes
            acc += jax.lax.dot_general(
                v.reshape(TH * W2, C2), w_ref[(dy * 3 + m) * C2:(dy * 3 + m + 1) * C2, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out_ref[...] = acc.reshape(1, TH, W2, O2).astype(out_ref.dtype)


def _row_tile(H: int, W2: int, C2: int) -> int:
    # patches (TH*W2, 9*C2) in the compute dtype drive the live set;
    # keep them ~<=5MB and divide H evenly
    budget = 5 * 2**20
    for th in (32, 16, 8, 4, 2, 1):
        if H % th == 0 and th * W2 * 9 * C2 * 2 <= budget:
            return th
    return 1


def _pack_weights(w, O):
    """w: (3, 3, C, O) -> (9*2C, 2O): [dy, m, a', c] rows x [a, o] cols,
    entry = w[dy, 2m+a'-a-1, c, o] where that tap exists, else 0."""
    C = w.shape[2]
    blocks = []
    for dy in range(3):
        for m in range(3):
            rows = []
            for ap in range(2):
                cols = []
                for a in range(2):
                    dx = 2 * m + ap - a - 1
                    cols.append(w[dy, dx] if 0 <= dx < 3
                                else jnp.zeros_like(w[0, 0]))
                rows.append(jnp.concatenate(cols, axis=-1))  # (C, 2O)
            blocks.append(jnp.concatenate(rows, axis=0))     # (2C, 2O)
    return jnp.concatenate(blocks, axis=0)                   # (18C, 2O)


def _conv3x3_pallas_raw(x, w, b):
    """x: (B, H, W, C); w: (3, 3, C, O); b: (O,) -> (B, H, W, O).
    Requires C == 64 (so 2C == 128 lanes), even W."""
    B, H, W, C = x.shape
    O = w.shape[-1]
    cdtype = x.dtype
    W2 = W // 2
    C2, O2 = 2 * C, 2 * O
    TH = _row_tile(H, W2, C2)
    # free W-s2d reshape, then pad: 1 row halo, 1 s2d-col halo + 8-alignment
    W2p = -(-(W2 + 2) // 8) * 8
    xs = x.reshape(B, H, W2, C2)
    xp = jnp.pad(xs, ((0, 0), (1, 1), (1, W2p - W2 - 1), (0, 0)))
    wf = _pack_weights(w, O).astype(cdtype)       # (9*C2, O2)
    br = jnp.concatenate([b, b]).reshape(1, O2).astype(jnp.float32)
    T = H // TH
    grid = (B * T,)
    vmem = (2 * (TH + 2) * W2p * C2 + 2 * TH * W2 * O2) * 2 \
        + 2 * TH * W2 * O2 * 4 + 9 * C2 * O2 * 2
    out = pl.pallas_call(
        functools.partial(_conv3x3_kernel, TH=TH, W2=W2, C2=C2, O2=O2,
                          T=T, cdtype=cdtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # stays in HBM; manual DMA
            pl.BlockSpec((9 * C2, O2), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O2), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, W2, O2), lambda g: (g // T, g % T, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W2, O2), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2, W2p, C2), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem * 1.5) + 2**20, 100 * 2**20),
            dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET,
    )(xp, wf, br)
    return out.reshape(B, H, W, O)  # free un-s2d


def _ref_conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(y.dtype)


@jax.custom_vjp
def conv3x3_same(x, w, b):
    """Fused 3x3/s1/SAME conv. x (B,H,W,C) with C == 64, even W;
    w (3,3,C,O), O <= 64, any float dtype (cast to x.dtype); b (O,).
    Returns (B,H,W,O) in x.dtype."""
    return _conv3x3_pallas_raw(x, w.astype(x.dtype), b)


def _fwd(x, w, b):
    return conv3x3_same(x, w, b), (x, w)


def _bwd(res, dy):
    x, w = res
    # dx: full correlation = conv3x3(dy, rot180(w) with in/out swapped)
    w_rot = jnp.flip(jnp.flip(w, 0), 1).transpose(0, 1, 3, 2)  # (3,3,O,C)
    zero_c = jnp.zeros((x.shape[-1],), jnp.float32)
    dx = _conv3x3_pallas_raw(dy, w_rot.astype(dy.dtype), zero_c)
    # dW, db: XLA's wgrad contracts over B*H*W (dense K — already efficient)
    _, vjp = jax.vjp(lambda wv: _ref_conv(x, wv.astype(x.dtype),
                                          jnp.zeros((w.shape[-1],), jnp.float32)), w)
    dw = vjp(dy)[0]
    db = jnp.sum(dy.astype(jnp.float32), axis=(0, 1, 2)).astype(w.dtype)
    return dx.astype(x.dtype), dw.astype(w.dtype), db


conv3x3_same.defvjp(_fwd, _bwd)
