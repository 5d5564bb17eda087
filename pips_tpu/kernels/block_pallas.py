"""Stage-granularity fused residual block for the encoder (VERDICT r4 #2).

The r4 trace put ~4.7 ms of the 29.7 ms train step in layout copies from
XLA's conv-strategy churn (conv inputs want a (BxC)-tiled {3,0,2,1} layout,
outputs emerge {1,3,2,0} — one relayout per IN/relu->conv edge) and the
per-conv Pallas kernel lost to its custom-VJP boundary
(``kernels/conv_pallas.py``: the boundary blocks epilogue fusion, one per
conv). This module amortizes ONE custom-VJP boundary across a whole
ResidualBlock — conv3+IN+relu+conv3+IN+relu+add (reference
``nets/pips.py:131-181``) — for the stage-1 s2d shapes (64ch at 1/2 res,
where both lane dims pack to 128):

  * pass 1: Pallas conv (halo-DMA implicit-im2col, from conv_pallas) that
    ALSO emits per-tile f32 (sum, sumsq) of its output — the instance-norm
    stats come out of the conv epilogue instead of a separate reduce pass;
  * tiny XLA step: tile stats -> pair-combined (s2d) mean/rsig;
  * pass 2: the same conv kernel with a PROLOGUE that normalizes + relus
    the halo band in VMEM (interior-masked so SAME-padding zeros survive)
    — the IN/relu->conv edge never exists at the HLO level, so there is
    nothing for XLA to relayout;
  * XLA elementwise tail: out = relu(x + relu(norm(y2))) (fuses freely).

Backward (hand-written, one boundary per block): two Pallas dgrad convs
(rotated/transposed weights — the full-correlation identity), XLA wgrads in
s2d space (dense K = B*H*W2, unpacked to (3,3,C,O) through the transpose of
the kernel-packing map), and the closed-form IN backward on raw conv
outputs + saved stats.

Status: measured on v5e (tools/profile_block_kernel.py) — see the profile
tool's docstring for the verdict and numbers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pips_tpu.kernels import conv_pallas
from pips_tpu.kernels.conv_pallas import (_pack_weights, _row_tile,
                                          interpret_mode)  # noqa: F401


def _conv3x3_stats_kernel(xp_hbm, w_ref, b_ref, aff_ref, out_ref, st_ref,
                          band, sem, *, TH, W2, C2, O2, T, H, prologue):
    """Row-tile conv (see conv_pallas._conv3x3_kernel) + IN-stats epilogue.

    aff_ref: (2, C2) f32 [scale; shift] for the prologue normalize+relu of
    the band (pass 2); ignored when ``prologue`` is False. st_ref:
    (1, 2, O2) f32 per-grid-step (sum, sumsq) of the conv output tile.
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
    def _prologue_dma():
        start(0, 0)

    @pl.when(g + 1 < G)
    def _prefetch_next():
        start(g + 1, (g + 1) % 2)

    pltpu.make_async_copy(
        xp_hbm.at[0, pl.dslice(0, TH + 2)],  # shape-only; sem carries identity
        band.at[cur], sem.at[cur]).wait()

    t = g % T
    W2p = band.shape[2]
    if prologue:
        # normalize + relu the band in VMEM, masking the SAME-pad border
        # back to zero (rows/cols outside the image). 2D iota compares ->
        # f32 mask -> 3D broadcast multiply (Mosaic-safe; see CLAUDE.md).
        rows = jax.lax.broadcasted_iota(jnp.int32, (TH + 2, W2p), 0) + t * TH
        cols = jax.lax.broadcasted_iota(jnp.int32, (TH + 2, W2p), 1)
        interior = ((rows >= 1) & (rows <= H) & (cols >= 1)
                    & (cols <= W2)).astype(jnp.float32)
        scale = aff_ref[0, 0, :].astype(jnp.float32)  # this image's affine
        shift = aff_ref[0, 1, :].astype(jnp.float32)
        bf = band[cur].astype(jnp.float32)
        bn = jnp.maximum(bf * scale + shift, 0.0) * interior[:, :, None]
        src = bn.astype(band.dtype)
    else:
        src = band[cur]

    acc = b_ref[...].astype(jnp.float32) * jnp.ones((TH * W2, 1), jnp.float32)
    for dy in range(3):
        for m in range(3):
            v = src[dy:dy + TH, m:m + W2, :]
            acc += jax.lax.dot_general(
                v.reshape(TH * W2, C2),
                w_ref[(dy * 3 + m) * C2:(dy * 3 + m + 1) * C2, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    st_ref[0, 0, :] = jnp.sum(acc, axis=0)
    st_ref[0, 1, :] = jnp.sum(acc * acc, axis=0)
    out_ref[...] = acc.reshape(1, TH, W2, O2).astype(out_ref.dtype)


def _conv_pass(xp, wf, br, aff, *, B, H, W2, C2, O2, prologue, out_dtype):
    """One Pallas conv pass over the padded s2d tensor xp (B, H+2, W2p, C2).
    Returns (y (B, H, W2, O2), stats (B, 2, O2) f32 summed over tiles)."""
    TH = _row_tile(H, W2, C2)
    T = H // TH
    grid = (B * T,)
    W2p = xp.shape[2]
    vmem = (2 * (TH + 2) * W2p * C2 + 2 * TH * W2 * O2) * 2 \
        + 2 * TH * W2 * O2 * 4 + 9 * C2 * O2 * 2
    y, st = pl.pallas_call(
        functools.partial(_conv3x3_stats_kernel, TH=TH, W2=W2, C2=C2, O2=O2,
                          T=T, H=H, prologue=prologue),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # HBM; manual halo DMA
            pl.BlockSpec((9 * C2, O2), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O2), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, C2), lambda g, T=T: (g // T, 0, 0),
                         memory_space=pltpu.VMEM),  # per-image IN affine
        ],
        out_specs=[
            pl.BlockSpec((1, TH, W2, O2), lambda g, T=T: (g // T, g % T, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, O2), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W2, O2), out_dtype),
            jax.ShapeDtypeStruct((B * T, 2, O2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, TH + 2, W2p, C2), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem * 1.5) + 2**20, 100 * 2**20),
            dimension_semantics=("arbitrary",)),
        interpret=conv_pallas._INTERPRET,
    )(xp, wf, br, aff)
    return y, st.reshape(B, T, 2, O2).sum(axis=1)


def _pair(t):
    """(..., 2C) s2d-channel stats -> per-logical-channel, tiled back."""
    C = t.shape[-1] // 2
    m = 0.5 * (t[..., :C] + t[..., C:])
    return jnp.concatenate([m, m], axis=-1)


def _mean_rsig(st, n, eps=1e-5):
    """st: (B, 2, O2) [sum, sumsq] over n pixels -> pair-combined (mean,
    rsig), each (B, 1, 1, O2) f32."""
    mean = _pair(st[:, 0] / n)
    mean_sq = _pair(st[:, 1] / n)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    return mean[:, None, None], jax.lax.rsqrt(var + eps)[:, None, None]


def _pad_s2d(x2, W2p):
    """(B, H, W2, C2) -> (B, H+2, W2p, C2): 1-row halo, 1 left s2d-col halo,
    right cols to the 8-aligned DMA width."""
    W2 = x2.shape[2]
    return jnp.pad(x2, ((0, 0), (1, 1), (1, W2p - W2 - 1), (0, 0)))


def _rot_pack(w, dtype):
    """Packed dgrad weights: full-correlation identity in logical space."""
    w_rot = jnp.flip(jnp.flip(w, 0), 1).transpose(0, 1, 3, 2)
    return _pack_weights(w_rot, w_rot.shape[-1]).astype(dtype)


def _in_bwd(dyh, y_raw, mean, rsig, n):
    """IN backward on the RAW conv output + saved stats: given d(normed),
    return d(raw). Pair-combined means (s2d layout)."""
    yf = ((y_raw.astype(jnp.float32) - mean) * rsig)  # normalized, pre-relu
    dyf = dyh.astype(jnp.float32)
    m1 = _pair(jnp.mean(dyf, axis=(1, 2), keepdims=True))
    m2 = _pair(jnp.mean(dyf * yf, axis=(1, 2), keepdims=True))
    return (rsig * (dyf - m1 - yf * m2)).astype(dyh.dtype)


def _block_fwd_core(x, w1, b1, w2, b2):
    B, H, W, C = x.shape
    O = w1.shape[-1]
    dt = x.dtype
    W2, C2, O2 = W // 2, 2 * C, 2 * O
    W2p = -(-(W2 + 2) // 8) * 8
    n_px = H * W2  # stats count in s2d pixels; _pair makes them logical

    x2 = x.reshape(B, H, W2, C2)
    wf1 = _pack_weights(w1.astype(dt), O)
    wf2 = _pack_weights(w2.astype(dt), O)
    br1 = jnp.concatenate([b1, b1]).reshape(1, O2).astype(jnp.float32)
    br2 = jnp.concatenate([b2, b2]).reshape(1, O2).astype(jnp.float32)
    aff0 = jnp.zeros((B, 2, C2), jnp.float32)

    y1, st1 = _conv_pass(_pad_s2d(x2, W2p), wf1, br1, aff0, B=B, H=H, W2=W2,
                         C2=C2, O2=O2, prologue=False, out_dtype=dt)
    mean1, rsig1 = _mean_rsig(st1, n_px)
    aff1 = jnp.stack([rsig1[:, 0, 0], -mean1[:, 0, 0] * rsig1[:, 0, 0]],
                     axis=1)  # (B, 2, C2)
    y2, st2 = _conv_pass(_pad_s2d(y1, W2p), wf2, br2, aff1,
                         B=B, H=H, W2=W2, C2=C2, O2=O2, prologue=True,
                         out_dtype=dt)
    mean2, rsig2 = _mean_rsig(st2, n_px)
    r = jnp.maximum((y2.astype(jnp.float32) - mean2) * rsig2, 0.0)
    out2 = jnp.maximum(x2.astype(jnp.float32) + r, 0.0).astype(dt)
    res = (x2, y1, y2, mean1, rsig1, mean2, rsig2, w1, w2)
    return out2.reshape(B, H, W, O), res


@jax.custom_vjp
def res_block64(x, w1, b1, w2, b2):
    """Fused stage-1 residual block: relu(x + relu(IN(conv2(relu(IN(
    conv1(x))))))), one custom-VJP boundary for the whole block.

    x: (B, H, W, 64) — B is the frame batch (instance norm is per-image),
    even W; w*: (3, 3, 64, 64); b*: (64,). Returns (B, H, W, 64)."""
    out, _ = _block_fwd_core(x, w1, b1, w2, b2)
    return out


def _rb_fwd(x, w1, b1, w2, b2):
    out, res = _block_fwd_core(x, w1, b1, w2, b2)
    return out, res


def _rb_bwd(res, dout):
    x2, y1, y2, mean1, rsig1, mean2, rsig2, w1, w2 = res
    B, H, W2, C2 = x2.shape
    O = w1.shape[-1]
    O2 = 2 * O
    W2p = -(-(W2 + 2) // 8) * 8
    dt = x2.dtype
    n_px = H * W2
    dout2 = dout.reshape(B, H, W2, C2)

    # tail: out = relu(x2 + r), r = relu((y2 - mean2) * rsig2)
    yh2 = jnp.maximum((y2.astype(jnp.float32) - mean2) * rsig2, 0.0)
    alive = (x2.astype(jnp.float32) + yh2 > 0).astype(jnp.float32)
    e = dout2.astype(jnp.float32) * alive
    dr = e * (yh2 > 0)
    dy2 = _in_bwd(dr.astype(dt), y2, mean2, rsig2, n_px)

    # conv2 backward: dgrad through the Pallas kernel, wgrad in s2d via XLA
    yh1 = jnp.maximum((y1.astype(jnp.float32) - mean1) * rsig1,
                      0.0).astype(dt)  # recomputed pass-2 input
    aff0 = jnp.zeros((B, 2, C2), jnp.float32)
    zb = jnp.zeros((1, O2), jnp.float32)
    dyh1, _ = _conv_pass(_pad_s2d(dy2, W2p), _rot_pack(w2, dt), zb, aff0,
                         B=B, H=H, W2=W2, C2=O2, O2=C2, prologue=False,
                         out_dtype=dt)
    dk2_2 = _wgrad_s2d(yh1, dy2)
    db2 = _db(dy2, O)

    dy1 = _in_bwd((dyh1.astype(jnp.float32) * (yh1 > 0)).astype(dt),
                  y1, mean1, rsig1, n_px)
    dx2, _ = _conv_pass(_pad_s2d(dy1, W2p), _rot_pack(w1, dt), zb, aff0,
                        B=B, H=H, W2=W2, C2=O2, O2=C2, prologue=False,
                        out_dtype=dt)
    dk2_1 = _wgrad_s2d(x2, dy1)
    db1 = _db(dy1, O)

    dx2 = (dx2.astype(jnp.float32) + e).astype(dt)
    dw1 = _unpack_wgrad(dk2_1, w1)
    dw2 = _unpack_wgrad(dk2_2, w2)
    return (dx2.reshape(dout.shape), dw1, db1, dw2, db2)


res_block64.defvjp(_rb_fwd, _rb_bwd)


def _wgrad_s2d(x2, dy2):
    """Packed-kernel weight grad via XLA's wgrad conv on the s2d tensors
    (K = B*H*W2 dense — the MXU-efficient contraction)."""
    _, vjp = jax.vjp(
        lambda k2: jax.lax.conv_general_dilated(
            x2, k2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        jnp.zeros((3, 3, x2.shape[-1], dy2.shape[-1]), x2.dtype))
    return vjp(dy2)[0]


def _unpack_wgrad(dk2, w):
    """(3, 3, 2C, 2O) packed-kernel grad -> (3, 3, C, O): transpose of the
    packing map (each logical tap aliases into up to 2 packed slots)."""
    O = w.shape[-1]
    # _pack_weights rows are [dy, m, a'*C + c] — exactly dk2's (3, 3, 2C)
    # leading dims flattened row-major; the packer's vjp maps the flat grad
    # back onto (3, 3, C, O), summing each logical tap's packed aliases
    dkf = dk2.reshape(9 * dk2.shape[2], dk2.shape[3])
    _, vjp = jax.vjp(lambda wv: _pack_weights(wv, O), w.astype(dk2.dtype))
    return vjp(dkf)[0].astype(w.dtype)


def _db(dy2, O):
    d = jnp.sum(dy2.astype(jnp.float32), axis=(0, 1, 2))
    return d[:O] + d[O:]
