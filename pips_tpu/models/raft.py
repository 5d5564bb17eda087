"""RAFT optical-flow baseline, JAX/flax, eval-oriented.

Capability parity with the reference's vendored RAFT
(``nets/raft_core/raft.py:27-150``, ``extractor.py``, ``corr.py``,
``update.py``; wrapper ``nets/raftnet.py:17-46``): feature/context encoders,
all-pairs correlation pyramid (4 levels, radius 4), SepConvGRU iterative
updates, convex upsampling. Used by the eval scripts as the flow-chaining
tracking baseline (``test_on_flt.py:144-161``).

TPU-first notes: NHWC; the all-pairs corr is one big MXU matmul
(B, HW, C) x (B, C, HW); the 9x9x4 lookup reuses the shared-fractional-offset
gather trick from ``pips_tpu.ops.corr``. BatchNorm runs in inference mode off
ported running stats (training RAFT is out of scope — it is eval-only
upstream too).
"""

from __future__ import annotations

import math
import flax.linen as nn
import jax
import jax.numpy as jnp

from pips_tpu.models.encoder import Conv, instance_norm
from pips_tpu.ops.grids import coords_grid
from pips_tpu.ops.resize import avg_pool2x2


class BatchNormInference(nn.Module):
    """BatchNorm2d in eval mode: normalize with stored running stats."""
    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros(self.features)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones(self.features)).value
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


class RaftResidualBlock(nn.Module):
    planes: int
    norm: str = "instance"
    stride: int = 1

    def _norm(self, x, name):
        if self.norm == "instance":
            return instance_norm(x)
        if self.norm == "batch":
            return BatchNormInference(self.planes, name=name)(x)
        return x

    @nn.compact
    def __call__(self, x):
        y = Conv(self.planes, 3, self.stride, 1, name="conv1")(x)
        y = nn.relu(self._norm(y, "norm1"))
        y = Conv(self.planes, 3, 1, 1, name="conv2")(y)
        y = nn.relu(self._norm(y, "norm2"))
        if self.stride != 1:
            x = Conv(self.planes, 1, self.stride, 0, name="downsample")(x)
            x = self._norm(x, "norm3")
        return nn.relu(x + y)


class RaftEncoder(nn.Module):
    """RAFT BasicEncoder: 1/8-scale features (``extractor.py:118-180``)."""
    output_dim: int = 256
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        x = Conv(64, 7, 2, 3, name="conv1")(x)
        if self.norm == "instance":
            x = instance_norm(x)
        elif self.norm == "batch":
            x = BatchNormInference(64, name="norm1")(x)
        x = nn.relu(x)
        for i, (dim, stride) in enumerate([(64, 1), (96, 2), (128, 2)]):
            x = RaftResidualBlock(dim, self.norm, stride, name=f"layer{i + 1}_0")(x)
            x = RaftResidualBlock(dim, self.norm, 1, name=f"layer{i + 1}_1")(x)
        return Conv(self.output_dim, 1, 1, 0, name="conv2")(x)


def allpairs_corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                          num_levels: int = 4) -> list[jnp.ndarray]:
    """fmap1/2: (B, H, W, C) -> per-level (B, H*W, h_l, w_l, 1) corr volumes."""
    B, H, W, C = fmap1.shape
    corr = jnp.einsum("bxc,byc->bxy", fmap1.reshape(B, H * W, C),
                      fmap2.reshape(B, H * W, C),
                      preferred_element_type=jnp.float32) / math.sqrt(C)
    corr = corr.reshape(B * H * W, H, W, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = avg_pool2x2(corr)
        pyramid.append(corr)
    return pyramid


def corr_lookup(pyramid: list[jnp.ndarray], coords: jnp.ndarray,
                radius: int = 4) -> jnp.ndarray:
    """coords: (B, H, W, 2) current matches at 1/8 scale.

    Returns (B, H, W, L*(2r+1)^2). RAFT's lookup patch uses the same
    transposed offset ordering as PIPs (``corr.py:45-49``: meshgrid(dy, dx)
    stacked last and added to (x, y)) — patch[i, j] samples (x + o_i, y + o_j),
    flattened i-major.
    """
    B, H, W, _ = coords.shape
    r = radius
    P = 2 * r + 1
    # Reuse the PIPs fused sampler: it expects pyramid (B', S, h, w, C),
    # targets (B', S, N, C), coords (B', S, N, 2); here each query pixel owns
    # its corr map: B' = B*H*W, S=1, N=1, C=1 with target=1 would rescale by
    # sqrt(C)=1 — do a direct gather instead for clarity.
    out = []
    for lvl, corr in enumerate(pyramid):
        h, w = corr.shape[1], corr.shape[2]
        c = coords.reshape(B * H * W, 2) / (2.0 ** lvl)
        x, y = c[:, 0], c[:, 1]
        x0f, y0f = jnp.floor(x), jnp.floor(y)
        wx = (x - x0f)[:, None, None]
        wy = (y - y0f)[:, None, None]
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        G = P + 1
        a = jnp.arange(G, dtype=jnp.int32)
        yy = y0[:, None] - r + a  # (BHW, G)
        xx = x0[:, None] - r + a
        valid = ((yy[:, :, None] >= 0) & (yy[:, :, None] <= h - 1)
                 & (xx[:, None, :] >= 0) & (xx[:, None, :] <= w - 1))
        flat = (jnp.clip(yy, 0, h - 1)[:, :, None] * w
                + jnp.clip(xx, 0, w - 1)[:, None, :]).reshape(B * H * W, G * G)
        vol = corr.reshape(B * H * W, h * w)
        g = jnp.take_along_axis(vol, flat, axis=1).reshape(B * H * W, G, G)
        g = g * valid.astype(g.dtype)
        interp = ((1 - wy) * (1 - wx) * g[:, 0:P, 0:P]
                  + (1 - wy) * wx * g[:, 0:P, 1:G]
                  + wy * (1 - wx) * g[:, 1:G, 0:P]
                  + wy * wx * g[:, 1:G, 1:G])  # indexed [j, i]
        interp = jnp.swapaxes(interp, -1, -2)  # reference ordering: [i, j]
        out.append(interp.reshape(B, H, W, P * P))
    return jnp.concatenate(out, axis=-1)


class BasicMotionEncoder(nn.Module):
    """(corr, flow) -> 128-dim motion features (``update.py:79-97``)."""
    corr_planes: int = 4 * 81

    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(Conv(256, 1, 1, 0, name="convc1")(corr))
        c = nn.relu(Conv(192, 3, 1, 1, name="convc2")(c))
        f = nn.relu(Conv(128, 7, 1, 3, name="convf1")(flow))
        f = nn.relu(Conv(64, 3, 1, 1, name="convf2")(f))
        out = nn.relu(Conv(126, 3, 1, 1, name="conv")(jnp.concatenate([c, f], -1)))
        return jnp.concatenate([out, flow], -1)  # 128


class SepConvGRU(nn.Module):
    """Separable (1x5 then 5x1) ConvGRU (``update.py:33-60``)."""
    hidden: int = 128

    @nn.compact
    def __call__(self, h, x):
        def gru(h, x, kh, kw, suffix):
            pad = (kh // 2, kw // 2)
            def conv(name):
                return nn.Conv(self.hidden, (kh, kw),
                               padding=((pad[0], pad[0]), (pad[1], pad[1])),
                               name=name)
            hx = jnp.concatenate([h, x], -1)
            z = nn.sigmoid(conv(f"convz{suffix}")(hx))
            r = nn.sigmoid(conv(f"convr{suffix}")(hx))
            q = nn.tanh(conv(f"convq{suffix}")(jnp.concatenate([r * h, x], -1)))
            return (1 - z) * h + z * q

        h = gru(h, x, 1, 5, "1")
        h = gru(h, x, 5, 1, "2")
        return h


class FlowHead(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(256, 3, 1, 1, name="conv1")(x))
        return Conv(2, 3, 1, 1, name="conv2")(x)


class BasicUpdateBlock(nn.Module):
    """(net, inp, corr, flow) -> (net, mask, delta_flow) (``update.py:114-139``)."""

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(name="encoder")(flow, corr)
        x = jnp.concatenate([inp, motion], -1)
        net = SepConvGRU(name="gru")(net, x)
        delta = FlowHead(name="flow_head")(net)
        mask = nn.relu(Conv(256, 3, 1, 1, name="mask1")(net))
        mask = Conv(64 * 9, 1, 1, 0, name="mask2")(mask) * 0.25
        return net, mask, delta


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex-combination 8x upsampling (``raft.py:77-91``).

    flow: (B, H, W, 2) at 1/8; mask: (B, H, W, 64*9). Returns (B, 8H, 8W, 2).
    """
    B, H, W, _ = flow.shape
    m = mask.reshape(B, H, W, 8, 8, 9)
    m = jax.nn.softmax(m, axis=-1)

    # 3x3 neighborhoods of 8*flow: pad then shift-stack (zeros padding, as in
    # torch unfold with padding=1)
    f = 8.0 * flow
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack([fp[:, dy:dy + H, dx:dx + W] for dy in range(3)
                       for dx in range(3)], axis=-2)  # (B, H, W, 9, 2)
    up = jnp.einsum("bhwijn,bhwnc->bhwijc", m, neigh)  # (B, H, W, 8, 8, 2)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(B, 8 * H, 8 * W, 2)
    return up


class RAFT(nn.Module):
    """Full RAFT (``raft.py:27-150``), NHWC, eval mode."""
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4

    def setup(self):
        self.fnet = RaftEncoder(256, "instance")
        self.cnet = RaftEncoder(self.hidden_dim + self.context_dim, "batch")
        self.update_block = BasicUpdateBlock()

    def __call__(self, image1: jnp.ndarray, image2: jnp.ndarray, iters: int = 20):
        """images: (B, H, W, 3) in [0, 255]. Returns (flow_low, flow_up)."""
        image1 = 2.0 * (image1 / 255.0) - 1.0
        image2 = 2.0 * (image2 / 255.0) - 1.0

        fmap1 = self.fnet(image1)
        fmap2 = self.fnet(image2)
        pyramid = allpairs_corr_pyramid(fmap1, fmap2, self.corr_levels)

        cnet = self.cnet(image1)
        net = jnp.tanh(cnet[..., :self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim:])

        B, H8, W8, _ = fmap1.shape
        coords0 = coords_grid(B, H8, W8)
        coords1 = coords0

        flow_up = None
        for _ in range(iters):
            coords1 = jax.lax.stop_gradient(coords1)
            corr = corr_lookup(pyramid, coords1, self.corr_radius)
            flow = coords1 - coords0
            net, mask, delta = self.update_block(net, inp, corr, flow)
            coords1 = coords1 + delta
            flow_up = convex_upsample(coords1 - coords0, mask)
        return coords1 - coords0, flow_up


class Raftnet:
    """Eval wrapper (``nets/raftnet.py:17-46``): [-0.5, 0.5] inputs, /8 padding."""

    def __init__(self, params, iters: int = 20):
        self.model = RAFT()
        self.params = params
        self.iters = iters
        self._fwd = jax.jit(
            lambda p, a, b: self.model.apply(p, a, b, iters=iters))

    def forward(self, image1, image2):
        """image1/2: (B, H, W, 3) in [-0.5, 0.5]. Returns flow_up (B, H, W, 2)."""
        import numpy as np

        image1 = (np.asarray(image1) + 0.5) * 255.0
        image2 = (np.asarray(image2) + 0.5) * 255.0
        B, H, W, _ = image1.shape
        pad_h = (-H) % 8
        pad_w = (-W) % 8
        if pad_h or pad_w:  # replicate-pad like InputPadder (``util.py:7-27``)
            pads = ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                    (pad_w // 2, pad_w - pad_w // 2), (0, 0))
            image1 = np.pad(image1, pads, mode="edge")
            image2 = np.pad(image2, pads, mode="edge")
        _, flow_up = self._fwd(self.params, jnp.asarray(image1), jnp.asarray(image2))
        flow_up = np.asarray(flow_up)
        if pad_h or pad_w:
            flow_up = flow_up[:, pad_h // 2:pad_h // 2 + H,
                              pad_w // 2:pad_w // 2 + W]
        return flow_up
