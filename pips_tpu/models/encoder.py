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

from pips_tpu.ops.resize import resize_bilinear_align_corners

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


class Conv(nn.Module):
    """Conv2d with torch-style explicit zero padding, NHWC."""
    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    dtype: Any = None  # compute dtype; params stay float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            kernel_init=kaiming_out,
            dtype=self.dtype,
        )(x)


class _StemInner(nn.Module):
    """7x7 stride-2 pad-3 conv; space-to-depth in f32, direct in bf16.

    In f32, a direct stride-2 conv on 3 input channels leaves the 128-wide
    MXU contraction ~97% idle (measured 6.95 ms for the stem at 8x480x1024
    on v5e); rearranged to a 4x4 VALID conv on a 2x2-space-to-depth input
    (12 channels) the same math runs as a dense matmul. In bf16 the ranking
    FLIPS: the s2d transpose relayout dominates and the direct conv is 2x
    faster (977 vs 1969 us at 8x384x512), so the bf16 path goes direct.
    Bit-equivalent up to fp reassociation either way; parameters keep the
    torch-port layout (kernel (7, 7, C, O)).
    """
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        kernel = self.param("kernel", kaiming_out, (7, 7, C, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        k = kernel.astype(dt)

        B, H, W, _ = x.shape
        if dt == jnp.bfloat16 or H % 2 or W % 2:
            y = jax.lax.conv_general_dilated(
                x, k, (2, 2), ((3, 3), (3, 3)),
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

    @nn.compact
    def __call__(self, x):
        return _StemInner(self.features, self.dtype, name="Conv_0")(x)


class ResidualBlock(nn.Module):
    """Two 3x3 convs with norm+relu and an optional strided 1x1 shortcut.

    Parity: reference ``nets/pips.py:131-181`` with norm_fn='instance'.
    """
    planes: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = Conv(self.planes, 3, self.stride, 1, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(instance_norm(y))
        y = Conv(self.planes, 3, 1, 1, dtype=self.dtype, name="conv2")(y)
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
    """
    output_dim: int = 128
    stride: int = 8
    stage_dims: Sequence[int] = (64, 96, 128, 128)
    dtype: Any = None
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, 3) -> (B, H//stride, W//stride, output_dim)."""
        H, W = x.shape[1], x.shape[2]
        out_hw = (H // self.stride, W // self.stride)
        if self.dtype is not None:
            x = x.astype(self.dtype)

        stem_cls = nn.remat(StemConv) if self.remat else StemConv
        block_cls = nn.remat(ResidualBlock) if self.remat else ResidualBlock

        x = stem_cls(self.stage_dims[0], dtype=self.dtype, name="conv1")(x)
        x = nn.relu(instance_norm(x))

        feats = []
        for i, dim in enumerate(self.stage_dims):
            stride = 1 if i == 0 else 2
            x = block_cls(dim, stride, dtype=self.dtype, name=f"layer{i + 1}_0")(x)
            x = block_cls(dim, 1, dtype=self.dtype, name=f"layer{i + 1}_1")(x)
            feats.append(resize_bilinear_align_corners(x, out_hw))

        x = jnp.concatenate(feats, axis=-1)
        x = Conv(self.output_dim * 2, 3, 1, 1, dtype=self.dtype, name="conv2")(x)
        x = nn.relu(instance_norm(x))
        x = Conv(self.output_dim, 1, 1, 0, dtype=self.dtype, name="conv3")(x)
        return x
