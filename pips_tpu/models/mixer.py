"""MLP-Mixer trajectory refiner (capability parity: reference ``nets/pips.py:93-123,283-311``).

The DeltaBlock consumes, per point, an (S, kitchen) tensor of
[current features | corr patches | sincos-embedded flow+time] and emits per-frame
(Δxy, Δfeat) through a depth-12 MLP-Mixer whose token axis is time (S frames).

TPU-first notes: all mixing ops are dense matmuls over the last axis (MXU);
the token-mixing "Conv1d(k=1) across S" of the reference is expressed as a
transpose + Dense, which XLA fuses into a single batched matmul. GELU is the
exact (erf) variant to match torch ``nn.GELU`` defaults.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pips_tpu.ops.embed import get_3d_embedding

def LN(name):
    """LayerNorm with torch eps; statistics always in float32."""
    inner = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)
    return lambda x: inner(x.astype(jnp.float32))


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


class TokenMixFF(nn.Module):
    """FeedForward across the token (S) axis: Dense(S->S*f) -> GELU -> Dense(->S).

    Expressed as einsums contracting the middle (S) axis directly — the
    explicit swapaxes pair materialized two (B, D, S) copies per block per
    iteration (part of the ~2.6 ms/step 'copy' family in the train-step
    xplane trace); einsum lets XLA fold the layout change into the dot."""
    tokens: int
    expansion: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):  # x: (B, S, D)
        w1 = _DenseParams(self.tokens * self.expansion, name="fc1")(self.tokens)
        w2 = _DenseParams(self.tokens, name="fc2")(self.tokens * self.expansion)
        cd = self.dtype or x.dtype
        # h kept in (B, D, E) — the dot's natural output order, no transpose
        h = jnp.einsum("bsd,se->bde", x.astype(cd), w1[0].astype(cd))
        h = gelu(h + w1[1].astype(cd))
        o = jnp.einsum("bde,es->bsd", h, w2[0].astype(cd))
        return o + w2[1].astype(cd)[None, :, None]


class ChannelMixFF(nn.Module):
    """FeedForward across channels: Dense(D->D*f) -> GELU -> Dense(->D)."""
    dim: int
    expansion: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):  # (B, S, D)
        x = nn.Dense(self.dim * self.expansion, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return x


class _LNParams(nn.Module):
    """Parameter-tree twin of nn.LayerNorm (scale/bias); used when the math
    runs in the fused Pallas block instead of the flax module. Same param
    paths + initializers -> checkpoints and the torch port interop."""

    @nn.compact
    def __call__(self, d):
        s = self.param("scale", nn.initializers.ones, (d,))
        b = self.param("bias", nn.initializers.zeros, (d,))
        return s, b


class _DenseParams(nn.Module):
    """Parameter-tree twin of nn.Dense (kernel/bias)."""
    features: int

    @nn.compact
    def __call__(self, d_in):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (d_in, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _ChanFFParams(nn.Module):
    """Parameter-tree twin of ChannelMixFF."""
    dim: int
    expansion: int = 4

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.dim * self.expansion, name="fc1")(self.dim)
        w2, b2 = _DenseParams(self.dim, name="fc2")(self.dim * self.expansion)
        return w1, b1, w2, b2


class MLPMixer(nn.Module):
    """input (B, S, input_dim) -> (B, output_dim); mean-pooled over S at the end.

    ``fuse_chanff=True`` runs each channel block (LN -> fc1 -> GELU -> fc2 ->
    residual) as ONE fused Pallas kernel with a custom VJP
    (``pips_tpu.kernels.mixer_pallas``): weights stay VMEM-resident, no
    intermediate touches HBM. Parameters are identical either way. The fused
    block keeps LN/GELU/accumulation in f32 (slightly MORE precise than the
    unfused bf16 path), so enable it only where bf16-level tolerance is
    acceptable — i.e. the mixed-precision compute path, not f32 parity runs.
    """
    S: int
    input_dim: int
    dim: int
    output_dim: int
    depth: int
    expansion: int = 4
    dtype: Any = None
    fuse_chanff: bool = False

    @nn.compact
    def __call__(self, x):
        # x: (B, S, input_dim), or a tuple of tensors whose last dims sum to
        # input_dim — the embed matmul is then computed as a sum of per-part
        # matmuls against slices of the SAME kernel (param tree unchanged),
        # so the (B, S, kitchen) concat is never materialized.
        parts = tuple(x) if isinstance(x, (tuple, list)) else (x,)
        assert sum(p.shape[-1] for p in parts) == self.input_dim
        w, b = _DenseParams(self.dim, name="embed")(self.input_dim)
        cd = self.dtype or parts[0].dtype
        wc = w.astype(cd)
        acc = None
        off = 0
        for p in parts:
            k = p.shape[-1]
            term = p.astype(cd) @ wc[off:off + k]
            off += k
            acc = term if acc is None else acc + term
        x = acc + b.astype(cd)
        for d in range(self.depth):
            # LayerNorm statistics in float32; FF compute in self.dtype
            x = x + TokenMixFF(self.S, self.expansion, dtype=self.dtype,
                               name=f"block{d}_token")(
                LN(f"block{d}_token_norm")(x).astype(x.dtype))
            if self.fuse_chanff:
                s_, b_ = _LNParams(name=f"block{d}_chan_norm")(self.dim)
                w1, b1, w2, b2 = _ChanFFParams(
                    self.dim, self.expansion, name=f"block{d}_chan")()
                from pips_tpu.kernels.mixer_pallas import (chan_ff_block,
                                                           chan_ff_reference)
                Bn, S_, D_ = x.shape
                fn = chan_ff_reference if self.is_initializing() else chan_ff_block
                x = fn(x.reshape(Bn * S_, D_), s_, b_, w1, b1, w2,
                       b2).reshape(Bn, S_, D_)
            else:
                x = x + ChannelMixFF(self.dim, self.expansion, dtype=self.dtype,
                                     name=f"block{d}_chan")(
                    LN(f"block{d}_chan_norm")(x).astype(x.dtype))
        x = LN("final_norm")(x)
        x = jnp.mean(x, axis=1)  # (B, dim)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="head")(x)


class DeltaBlock(nn.Module):
    """Per-point iterative update head: (ffeat, corr, flow) -> (S, latent+2) deltas.

    kitchen_dim = corr_levels*(2r+1)^2 + latent + 64*3 + 3
    (reference ``nets/pips.py:289``: 196 + 128 + 195 = 519 at defaults).
    """
    latent_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 3
    S: int = 8
    mixer_dim: int = 512
    mixer_depth: int = 12
    dtype: Any = None
    fuse_chanff: bool = False

    @nn.compact
    def __call__(self, fhid: jnp.ndarray, fcorr: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
        """fhid: (B*, S, latent); fcorr: (B*, S, L*(2r+1)^2); flow: (B*, S, 3)
        where flow = [dx, dy, t]. Returns (B*, S, latent+2)."""
        Bn, S, D = flow.shape
        assert D == 3
        flow_sincos = get_3d_embedding(flow, 64, cat_coords=True)  # (B*, S, 195)
        x = (fhid, fcorr, flow_sincos)  # concat folded into the embed matmul
        delta = MLPMixer(
            S=self.S,
            input_dim=sum(p.shape[-1] for p in x),
            dim=self.mixer_dim,
            output_dim=self.S * (self.latent_dim + 2),
            depth=self.mixer_depth,
            dtype=self.dtype,
            fuse_chanff=self.fuse_chanff,
            name="to_delta",
        )(x)
        return delta.reshape(Bn, self.S, self.latent_dim + 2)
