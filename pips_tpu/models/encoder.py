"""Residual CNN feature encoder (capability parity: reference ``nets/pips.py:131-281``).

TPU-first: NHWC layout so convolutions tile directly onto the MXU; instance
norm is a small fused reduction over (H, W); the multi-scale fusion resize is
two matmuls (see ``pips_tpu.ops.resize``).

Architecture (norm_fn='instance' is what Pips uses):
  conv 7x7/2 -> IN -> relu
  stage1: 2x ResidualBlock(64,  stride 1)   @ 1/2
  stage2: 2x ResidualBlock(96,  stride 2)   @ 1/4
  stage3: 2x ResidualBlock(128, stride 2)   @ 1/8
  stage4: 2x ResidualBlock(128, stride 2)   @ 1/16
  resize all to 1/stride, concat (416ch) -> conv3x3(2*out) -> IN -> relu -> conv1x1(out)
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pips_tpu.ops.resize import (resize_bilinear_align_corners,
                                 resize_bilinear_align_corners_s2d)

# matches torch kaiming_normal_(mode='fan_out', nonlinearity='relu')
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Non-affine instance norm over spatial dims. x: (B, H, W, C).

    Parity with torch ``nn.InstanceNorm2d`` defaults (affine=False,
    track_running_stats=False, eps=1e-5, biased variance). Statistics are
    computed in float32 regardless of compute dtype; mean and second moment
    come from one fused reduction pass (E[x^2]-E[x]^2) — the two-pass form
    measured 2.2 ms per call at 1/2-res on v5e.

    Custom VJP: autodiff through the stats materializes several full-size
    f32 intermediates per norm (the encoder backward's hot spot in mixed
    precision); the hand-derived backward
    ``dx = rsig * (dy - mean(dy) - y * mean(dy*y))``
    is two fused reduction passes with all HBM tensors in the compute dtype.
    """
    y, _ = _in_fwd(x, eps)
    return y


def _in_stats(x, eps):
    xf = x.astype(jnp.float32)
    # both reductions read x independently -> XLA multi-output fusion does one
    # pass (the (x-mean)^2 form serializes two full passes)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    rsig = jax.lax.rsqrt(var + eps)
    return ((xf - mean) * rsig).astype(x.dtype), rsig


def _in_fwd(x, eps):
    y, rsig = _in_stats(x, eps)
    return y, (y, rsig)


def _in_bwd(eps, res, dy):
    y, rsig = res
    n = y.shape[1] * y.shape[2]
    dyf = dy.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    m1 = jnp.sum(dyf, axis=(1, 2), keepdims=True) / n
    m2 = jnp.sum(dyf * yf, axis=(1, 2), keepdims=True) / n
    dx = (rsig * (dyf - m1 - yf * m2)).astype(dy.dtype)
    return (dx,)


instance_norm.defvjp(_in_fwd, _in_bwd)


def _pair_mean(t: jnp.ndarray) -> jnp.ndarray:
    """(B, 1, 1, 2C) per-s2d-channel stats -> per-LOGICAL-channel stats,
    tiled back to 2C (phases c and c+C of the W-s2d layout are the same
    logical channel)."""
    C = t.shape[-1] // 2
    m = 0.5 * (t[..., :C] + t[..., C:])
    return jnp.concatenate([m, m], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def instance_norm_s2d(x2: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """``instance_norm`` evaluated natively on the W-s2d layout.

    x2: (B, H, W/2, 2C) viewing an (B, H, W, C) tensor; equals
    ``instance_norm(x).reshape`` up to fp reassociation, but never leaves
    the 128-lane layout: per-s2d-channel reductions (tiny (B, 2C) stats)
    are pair-combined on the host-free stats tensor, so the big tensor
    needs no relayout (an un-s2d reshape is free in row-major terms but is
    a real data movement in the TPU's tiled layout — measured +2.3 ms/step
    when stage 1 un-s2d'd around every norm)."""
    y, _ = _ins2d_fwd(x2, eps)
    return y


def _ins2d_stats(x, eps):
    xf = x.astype(jnp.float32)
    mean = _pair_mean(jnp.mean(xf, axis=(1, 2), keepdims=True))
    mean_sq = _pair_mean(jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True))
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    rsig = jax.lax.rsqrt(var + eps)
    return ((xf - mean) * rsig).astype(x.dtype), rsig


def _ins2d_fwd(x, eps):
    y, rsig = _ins2d_stats(x, eps)
    return y, (y, rsig)


def _ins2d_bwd(eps, res, dy):
    y, rsig = res
    dyf = dy.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    m1 = _pair_mean(jnp.mean(dyf, axis=(1, 2), keepdims=True))
    m2 = _pair_mean(jnp.mean(dyf * yf, axis=(1, 2), keepdims=True))
    dx = (rsig * (dyf - m1 - yf * m2)).astype(dy.dtype)
    return (dx,)


instance_norm_s2d.defvjp(_ins2d_fwd, _ins2d_bwd)


class _Conv3Inner(nn.Module):
    """Fused implicit-im2col 3x3/s1 conv (kernels/conv_pallas.py) with the
    nn.Conv-compatible param tree (kernel (3,3,C,O) HWIO + bias)."""
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from pips_tpu.kernels.conv_pallas import _ref_conv, conv3x3_same

        C = x.shape[-1]
        kernel = self.param("kernel", kaiming_out, (3, 3, C, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or x.dtype
        fn = _ref_conv if self.is_initializing() else conv3x3_same
        return fn(x.astype(dt), kernel.astype(dt), bias)


def _pack_s2d_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, O) conv kernel -> (3, 3, 2C, 2O) kernel computing the SAME
    conv on the W-only space-to-depth layout ((H, W, C) viewed as
    (H, W/2, 2C) — a free reshape in NHWC).

    Output pixel pair (w=2*w2+a): input tap u = 2*w2 + a + dx - 1 lands in
    s2d column w2 + m, phase a', with dx = 2m + a' - a + 1; taps with dx
    outside [0, 3) are structural zeros (50% of the packed kernel). Trace-
    time weight-space ops only — autodiff routes dW through the slices.
    """
    C, O = w.shape[2], w.shape[3]
    zero = jnp.zeros_like(w[:, 0])
    cols_m = []
    for m in (-1, 0, 1):
        rows = []
        for ap in range(2):
            cols = []
            for a in range(2):
                dx = 2 * m + ap - a + 1
                cols.append(w[:, dx] if 0 <= dx < 3 else zero)
            rows.append(jnp.concatenate(cols, axis=-1))   # (3, C, 2O)
        cols_m.append(jnp.concatenate(rows, axis=1))      # (3, 2C, 2O)
    return jnp.stack(cols_m, axis=1)                      # (3, 3, 2C, 2O)


class _Conv3S2dRaw(nn.Module):
    """3x3/s1/SAME conv evaluated natively in the W-s2d layout (pure XLA):
    input AND output are (B, H, W/2, 2C) views of (B, H, W, C) tensors.

    Lane-occupancy rewrite for the encoder's 64-channel stage: XLA's per-tap
    conv strategy fills K = C_in of the MXU's 128 lanes and its pass count is
    invariant to C_in below 128 (measured, tools/profile_conv_roofline.py),
    so the 64->64 convs run half-empty. In the W-s2d view the same math is a
    3x3 conv with a packed (3,3,128,128) kernel — half the rows at full K
    and N occupancy: 1.48x measured (473 -> 320 us at 8x192x256 bf16,
    tools/profile_conv_s2d.py). Autodiff's dgrad inherits the layout (same
    win); wgrad contracts over B*H*W2 with 128 channels each side. Param
    tree identical to nn.Conv (kernel (3,3,C,O) HWIO + bias). The caller
    must keep the surrounding ops in the s2d layout too — un-s2d'ing per
    conv is a real relayout in the TPU's tiled layout (see
    ``instance_norm_s2d``)."""
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x2):
        C = x2.shape[-1] // 2
        kernel = self.param("kernel", kaiming_out, (3, 3, C, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or x2.dtype
        k2 = _pack_s2d_kernel(kernel.astype(dt))
        y2 = jax.lax.conv_general_dilated(
            x2.astype(dt), k2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y2 + jnp.concatenate([bias, bias]).astype(dt)


class _S2dConv(nn.Module):
    """Wrapper giving ``_Conv3S2dRaw`` the same param path as ``Conv``
    (``<name>/Conv_0/{kernel,bias}``)."""
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x2):
        return _Conv3S2dRaw(self.features, self.dtype, name="Conv_0")(x2)


class Conv(nn.Module):
    """Conv2d with torch-style explicit zero padding, NHWC.

    ``fuse=True`` routes eligible shapes (3x3, stride 1, pad 1, 64->64,
    even W) through the fused implicit-im2col Pallas kernel
    (kernels/conv_pallas.py — a documented experiment; its custom-VJP
    boundary loses end-to-end). The production lane-occupancy rewrite for
    those shapes lives at the block level instead (``ResidualBlock`` s2d
    mode). Param tree is identical in every mode.
    """
    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    dtype: Any = None  # compute dtype; params stay float32
    fuse: bool = False

    @nn.compact
    def __call__(self, x):
        if (self.fuse and self.kernel == 3 and self.stride == 1
                and self.pad == 1 and x.shape[-1] == 64
                and self.features == 64 and x.shape[-2] % 2 == 0):
            return _Conv3Inner(self.features, self.dtype, name="Conv_0")(x)
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            kernel_init=kaiming_out,
            dtype=self.dtype,
        )(x)


def _stem_s2d_kernel(k7: jnp.ndarray) -> jnp.ndarray:
    """(4, 14C, O) row-tap-unfolded stem kernel -> (1, 3, 28C, 2O) kernel
    producing the W-s2d OUTPUT layout directly (output col pair 2p+a packed
    at channel a*O+o).

    Output col q = 2p+a of the (1,4) unfolded conv reads x7 cols q..q+3;
    the pair therefore reads x7 cols 2p+u, u in [0, 5) — i.e. s2d-of-x7
    cols p+du at phase bu (u = 2*du + bu), a (1,3) conv with C_in doubled:
        K[0, du, bu*14C + j, a*O + o] = k7[2*du + bu - a, j, o]
    (structural zero outside 0 <= 2du+bu-a < 4). Same MACs per useful
    output; fewer XLA per-tap passes (3 vs 4) at twice the lane fill, and
    the stem -> stage-1 s2d boundary relayout never exists.
    """
    taps, Cin, O = k7.shape
    z = jnp.zeros_like(k7[0])
    blocks = []
    for du in range(3):
        rows = []
        for bu in range(2):
            cols = []
            for a in range(2):
                kx = 2 * du + bu - a
                cols.append(k7[kx] if 0 <= kx < taps else z)
            rows.append(jnp.concatenate(cols, axis=-1))  # (14C, 2O)
        blocks.append(jnp.concatenate(rows, axis=0))     # (28C, 2O)
    return jnp.stack(blocks, axis=0)[None]               # (1, 3, 28C, 2O)


class _StemInner(nn.Module):
    """7x7 stride-2 pad-3 conv; space-to-depth in f32, W-only s2d in bf16.

    In f32, a direct stride-2 conv on 3 input channels leaves the 128-wide
    MXU contraction ~97% idle (measured 6.95 ms for the stem at 8x480x1024
    on v5e); rearranged to a 4x4 VALID conv on a 2x2-space-to-depth input
    (12 channels) the same math runs as a dense matmul. In bf16 the full-s2d
    transpose relayout dominates (1969 us vs 977 direct at 8x384x512) — but
    a W-ONLY space-to-depth is a FREE reshape in NHWC ((H, W, 3) and
    (H, W/2, 6) share a memory layout), halving the tap count with no
    relayout: 639 us vs 1600 direct at 8x384x512 (scalar-closure chain, r3).
    Bit-equivalent up to fp reassociation every way; parameters keep the
    torch-port layout (kernel (7, 7, C, O)).
    """
    features: int
    dtype: Any = None
    emit_s2d: bool = False  # bf16: return the (B, H/2, W/4, 2*features)
                            # W-s2d view of the output (requires W % 4 == 0)

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        kernel = self.param("kernel", kaiming_out, (7, 7, C, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        k = kernel.astype(dt)

        B, H, W, _ = x.shape
        if self.emit_s2d:
            assert dt == jnp.bfloat16 and H % 2 == 0 and W % 4 == 0, \
                "emit_s2d requires the bf16 row-tap path and W % 4 == 0"
        if H % 2 or W % 2:
            y = jax.lax.conv_general_dilated(
                x, k, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias.astype(dt)

        if dt == jnp.bfloat16:
            # W-only s2d: tap dx in [0,7) with a leading zero col -> 2m + a,
            # m in [0,4), a in {0,1}; input left-padded 4 (=3+1 tap shift)
            kpad = jnp.pad(k, ((0, 0), (1, 0), (0, 0), (0, 0)))  # (7,8,C,O)
            k2 = kpad.reshape(7, 4, 2 * C, self.features)
            xp = jnp.pad(x, ((0, 0), (3, 3), (4, 2), (0, 0)))
            x2 = xp.reshape(B, H + 6, (W + 6) // 2, 2 * C)
            # Row-tap unfold (r4): fold the 7 ky taps into channels,
            #   x7[b, h, w', ky*2C + c] = x2[b, 2h+ky, w', c],
            # turning the stride-(2,1) 7x4 conv into a stride-1 (1,4) conv
            # with C_in = 14C = 42. Two wins (tools/profile_stem_wgrad.py,
            # B=1 384x512 bf16): (a) forward 211 -> 115 us — XLA's per-tap
            # pass count scales with tap count (28 -> 4) and in padded-lane
            # HBM bytes x7 (42->128 lanes) is HALF of x2 (6->128); (b) the
            # autodiff WEIGHT-grad — the last pathological conv, M = C_in
            # on the MXU sublanes — goes 6 -> 42 rows: fwd+wgrad 857 ->
            # ~250 us. Beats the in-VMEM-im2col Pallas wgrad kernel too
            # (kernels/stem_wgrad_pallas.py, 967 us: collapse relayouts
            # dominate). Exactly the same math (max|diff| = bf16 rounding).
            Ho = H // 2
            x7 = jnp.concatenate(
                [x2[:, ky:ky + 2 * Ho:2] for ky in range(7)], axis=-1)
            # k7[0, kx, ky*2C+c, o] = k2[ky, kx, c, o]
            k7 = k2.transpose(1, 0, 2, 3).reshape(4, 14 * C, self.features)
            if self.emit_s2d:
                # pack output col pairs into channels: a (1,3) conv on the
                # W-s2d view of x7 (a free NHWC reshape after padding its
                # width even) emits stage-1's s2d layout natively — the
                # stem -> stage-1 boundary relayout disappears and XLA's
                # per-tap conv runs 3 passes at 2x lane fill over half the
                # rows instead of 4 (see _stem_s2d_kernel).
                Wx = x7.shape[2]
                if Wx % 2:
                    x7 = jnp.pad(x7, ((0, 0), (0, 0), (0, 1), (0, 0)))
                x7s = x7.reshape(B, Ho, (Wx + 1) // 2, 2 * x7.shape[-1])
                y2 = jax.lax.conv_general_dilated(
                    x7s, _stem_s2d_kernel(k7), (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return y2 + jnp.concatenate([bias, bias]).astype(dt)
            y = jax.lax.conv_general_dilated(
                x7, k7[None], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias.astype(dt)

        # kernel tap dy in [0,7) with a leading zero row/col -> dy' = 2m + a
        kpad = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8, 8, C, O)
        k2 = kpad.reshape(4, 2, 4, 2, C, self.features)
        k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * C, self.features)

        xp = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
        Hp, Wp = (H + 8) // 2, (W + 8) // 2
        x2 = xp.reshape(B, Hp, 2, Wp, 2, C)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, 4 * C)

        y = jax.lax.conv_general_dilated(
            x2, k2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[:, : H // 2, : W // 2] + bias.astype(dt)


class StemConv(nn.Module):
    """Stem conv with the torch-compatible param path (``.../Conv_0/...``)."""
    features: int
    dtype: Any = None
    emit_s2d: bool = False

    @nn.compact
    def __call__(self, x):
        return _StemInner(self.features, self.dtype, self.emit_s2d,
                          name="Conv_0")(x)


class _Conv3S2dDownRaw(nn.Module):
    """3x3 stride-2 conv CONSUMING the W-s2d layout (pure XLA):
    (B, H, P, 2C) view of (B, H, 2P, C) -> (B, H/2, P, O) in the plain
    layout. Same MACs as the plain conv (the packed (3, 2, 2C, O) kernel is
    1/4 structural zeros but each useful tap appears once); lets stage 2
    read stage 1's s2d tensor with no un-s2d relayout."""
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x2):
        C = x2.shape[-1] // 2
        kernel = self.param("kernel", kaiming_out, (3, 3, C, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or x2.dtype
        w = kernel.astype(dt)
        # output (ho, p) = orig (2ho, 2p): taps at orig cols 2p-1, 2p, 2p+1
        # = s2d (p-1, phase 1), (p, phase 0), (p, phase 1)
        zero = jnp.zeros_like(w[:, 0])
        k0 = jnp.concatenate([zero, w[:, 0]], axis=1)   # s2d col p-1
        k1 = jnp.concatenate([w[:, 1], w[:, 2]], axis=1)  # s2d col p
        k2 = jnp.stack([k0, k1], axis=1)                # (3, 2, 2C, O)
        y = jax.lax.conv_general_dilated(
            x2.astype(dt), k2, (2, 1), ((1, 1), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(dt)


class _Conv1S2dDownRaw(nn.Module):
    """1x1 stride-2 conv consuming W-s2d: orig col 2p is phase 0 of s2d col
    p, so the packed (1, 1, 2C, O) kernel zeros the phase-1 rows and the
    W stride vanishes."""
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x2):
        C = x2.shape[-1] // 2
        kernel = self.param("kernel", kaiming_out, (1, 1, C, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or x2.dtype
        w = kernel.astype(dt)
        k2 = jnp.concatenate([w, jnp.zeros_like(w)], axis=2)  # (1, 1, 2C, O)
        y = jax.lax.conv_general_dilated(
            x2.astype(dt), k2, (2, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(dt)


class _S2dDownConv(nn.Module):
    """``_Conv3S2dDownRaw``/``_Conv1S2dDownRaw`` with the ``Conv``-compatible
    param path (``<name>/Conv_0/{kernel,bias}``)."""
    features: int
    kernel: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x2):
        cls = _Conv3S2dDownRaw if self.kernel == 3 else _Conv1S2dDownRaw
        return cls(self.features, self.dtype, name="Conv_0")(x2)


class ResidualBlock(nn.Module):
    """Two 3x3 convs with norm+relu and an optional strided 1x1 shortcut.

    Parity: reference ``nets/pips.py:131-181`` with norm_fn='instance'.

    ``s2d=True`` (stage-1 bf16 production path) evaluates the WHOLE block in
    the W-s2d layout — packed-kernel convs at full MXU lane occupancy
    (``_Conv3S2dRaw``), pair-combined instance norm (``instance_norm_s2d``),
    relu and the residual add in-layout. The block's external interface
    stays (B, H, W, C): the entry/exit reshapes between adjacent s2d blocks
    cancel in XLA's algebraic simplifier, so the stage pays one real
    relayout at its boundary, not one per conv. Param tree unchanged.

    ``s2d_io=True`` goes further: the block ACCEPTS and RETURNS the
    (B, H, W/2, 2C) s2d view with no reshape at all — for the fully-s2d
    stage-1 pipeline where the stem emits s2d (``StemConv.emit_s2d``) and
    the stage-2 downsample consumes it (``s2d_in``), so the boundary
    relayout never exists.

    ``s2d_in=True`` (stride-2 stage entry, e.g. layer2_0): conv1 and the
    1x1 downsample shortcut consume the s2d input via packed kernels
    (``_S2dDownConv``) and emit the PLAIN layout; the rest of the block is
    the standard path.
    """
    planes: int
    stride: int = 1
    dtype: Any = None
    fuse_conv3: bool = False
    s2d: bool = False
    s2d_io: bool = False
    s2d_in: bool = False

    @nn.compact
    def __call__(self, x):
        if self.s2d_io:
            assert self.stride == 1 and 2 * self.planes == x.shape[-1]
            y2 = _S2dConv(self.planes, dtype=self.dtype, name="conv1")(x)
            y2 = nn.relu(instance_norm_s2d(y2))
            y2 = _S2dConv(self.planes, dtype=self.dtype, name="conv2")(y2)
            y2 = nn.relu(instance_norm_s2d(y2))
            return nn.relu(x + y2)
        if self.s2d_in:
            assert self.stride == 2
            y = _S2dDownConv(self.planes, 3, dtype=self.dtype,
                             name="conv1")(x)
            y = nn.relu(instance_norm(y))
            y = Conv(self.planes, 3, 1, 1, dtype=self.dtype,
                     fuse=self.fuse_conv3, name="conv2")(y)
            y = nn.relu(instance_norm(y))
            sc = _S2dDownConv(self.planes, 1, dtype=self.dtype,
                              name="downsample")(x)
            return nn.relu(instance_norm(sc) + y)

        use_s2d = (self.s2d and not self.fuse_conv3 and self.stride == 1
                   and x.shape[-1] == self.planes and self.planes == 64
                   and x.shape[-2] % 2 == 0)
        if use_s2d:
            B, H, W, C = x.shape
            x2 = x.reshape(B, H, W // 2, 2 * C)
            y2 = _S2dConv(self.planes, dtype=self.dtype, name="conv1")(x2)
            y2 = nn.relu(instance_norm_s2d(y2))
            y2 = _S2dConv(self.planes, dtype=self.dtype, name="conv2")(y2)
            y2 = nn.relu(instance_norm_s2d(y2))
            return nn.relu(x2 + y2).reshape(B, H, W, C)

        y = Conv(self.planes, 3, self.stride, 1, dtype=self.dtype,
                 fuse=self.fuse_conv3, name="conv1")(x)
        y = nn.relu(instance_norm(y))
        y = Conv(self.planes, 3, 1, 1, dtype=self.dtype,
                 fuse=self.fuse_conv3, name="conv2")(y)
        y = nn.relu(instance_norm(y))
        if self.stride != 1:
            x = Conv(self.planes, 1, self.stride, 0, dtype=self.dtype,
                     name="downsample")(x)
            x = instance_norm(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Stride-``stride`` feature encoder producing ``output_dim`` channels.

    ``remat=True`` rematerializes each residual block (and the stem) on the
    backward pass: only block *inputs* are saved, so the encoder's backward
    working set drops from every intermediate activation at 1/2-1/16 res to
    one tensor per stage — the piece that made the production-config step
    (4hv, N=768, 384x512) exceed single-chip HBM without grad accumulation.

    ``full_s2d=True`` (default; bf16 with W % 4 == 0 only): stage 1 runs
    END-TO-END in the W-s2d layout with no boundary relayout at all — the
    stem emits s2d natively (``StemConv.emit_s2d``), both layer-1 blocks are
    ``s2d_io``, the fusion resize contracts H before un-s2d'ing
    (``resize_bilinear_align_corners_s2d``), and layer2_0's strided convs
    consume s2d directly (``s2d_in``). Attacks the ~2 ms/step of stage-1
    entry/exit layout copies the r5 xplane trace localized (the s2d
    (H, W/2, 2C) <-> plain (H, W, C) reshape is a real cross-lane-tile data
    movement on TPU). Math is exact (same MACs, packed kernels with
    structural zeros); param tree unchanged in every mode.
    """
    output_dim: int = 128
    stride: int = 8
    stage_dims: Sequence[int] = (64, 96, 128, 128)
    dtype: Any = None
    remat: bool = False
    fuse_conv3: bool = False
    full_s2d: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, 3) -> (B, H//stride, W//stride, output_dim)."""
        H, W = x.shape[1], x.shape[2]
        out_hw = (H // self.stride, W // self.stride)
        if self.dtype is not None:
            x = x.astype(self.dtype)

        stem_cls = nn.remat(StemConv) if self.remat else StemConv
        block_cls = nn.remat(ResidualBlock) if self.remat else ResidualBlock

        # stage-1 blocks run in the W-s2d layout in bf16 (full MXU lane
        # occupancy for the 64-channel convs; see ResidualBlock.s2d);
        # with full_s2d the whole stage-1 pipeline stays in s2d.
        s2d1 = self.dtype == jnp.bfloat16 and not self.fuse_conv3
        full = (self.full_s2d and s2d1 and self.stage_dims[0] == 64
                and len(self.stage_dims) > 1 and H % 2 == 0 and W % 4 == 0)

        x = stem_cls(self.stage_dims[0], dtype=self.dtype, emit_s2d=full,
                     name="conv1")(x)
        x = nn.relu(instance_norm_s2d(x) if full else instance_norm(x))

        feats = []
        for i, dim in enumerate(self.stage_dims):
            stride = 1 if i == 0 else 2
            if full and i == 0:
                x = block_cls(dim, 1, dtype=self.dtype, s2d_io=True,
                              name="layer1_0")(x)
                x = block_cls(dim, 1, dtype=self.dtype, s2d_io=True,
                              name="layer1_1")(x)
                feats.append(resize_bilinear_align_corners_s2d(x, out_hw))
                continue
            x = block_cls(dim, stride, dtype=self.dtype,
                          fuse_conv3=self.fuse_conv3, s2d=s2d1 and i == 0,
                          s2d_in=full and i == 1,
                          name=f"layer{i + 1}_0")(x)
            x = block_cls(dim, 1, dtype=self.dtype,
                          fuse_conv3=self.fuse_conv3, s2d=s2d1 and i == 0,
                          name=f"layer{i + 1}_1")(x)
            feats.append(resize_bilinear_align_corners(x, out_hw))

        x = jnp.concatenate(feats, axis=-1)
        x = Conv(self.output_dim * 2, 3, 1, 1, dtype=self.dtype, name="conv2")(x)
        x = nn.relu(instance_norm(x))
        x = Conv(self.output_dim, 1, 1, 0, dtype=self.dtype, name="conv3")(x)
        return x
