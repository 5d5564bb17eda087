"""Pips2: the PIPs++ model family — an S-agnostic point tracker.

Capability parity with the reference's *intent* in ``train2.py`` (the
upstream file is an aspirational scaffold: it imports a nonexistent
``nets/pips2.py`` and a missing dataset, ``train2.py:11,163``, and expects
``model(...) -> (preds, preds_anim, vis_e, (seq_loss, vis_loss))`` with NO
score-map CE term, ``train2.py:77-81``). Done right here:

  * the refiner has NO structural dependence on the window length S — the
    fixed-S MLP-Mixer token mixing (``nets/pips.py:111-123``) is replaced by
    depthwise temporal convolutions and the per-window flattened head
    (``Linear(S*(latent+2))``) by a per-frame pointwise head — so one set of
    weights tracks windows of any length (PointOdyssey-style long-window
    training, arbitrary-length inference windows).
  * everything else reuses the TPU-first machinery of ``models/pips.py``:
    the shared BasicEncoder, the four equivalent corr paths, in-loop
    stop_gradient, eval-time query-frame locking, and the fused Pallas
    channel-FF kernel for the refiner's pointwise blocks.

TPU notes: temporal depthwise convs are VPU work (tiny FLOPs) while all
heavy compute stays in the dense embed/FF matmuls (MXU); the layout is the
same (B*N, S, D) rows-of-points the mixer uses, so the fused channel-FF
kernel applies unchanged.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pips_tpu.models.encoder import BasicEncoder
from pips_tpu.models.mixer import (LN, ChannelMixFF, _ChanFFParams, _DenseParams,
                                   _LNParams, gelu)
from pips_tpu.models.pips import PipsOutput
from pips_tpu.ops.corr import (build_fmap_pyramid, corr_pyramid,
                               fused_corr_sample, sample_corr_pyramid)
from pips_tpu.ops.embed import get_3d_embedding
from pips_tpu.ops.samp import bilinear_sample2d


class TemporalBlock(nn.Module):
    """S-agnostic refiner block: LN -> depthwise temporal conv (k=3, SAME)
    residual, then LN -> channel FF residual (optionally the fused Pallas
    kernel). Weights are independent of S by construction."""
    dim: int
    expansion: int = 4
    dtype: Any = None
    fuse_chanff: bool = False

    @nn.compact
    def __call__(self, x):  # (R, S, D)
        h = LN("tnorm")(x).astype(x.dtype)
        h = nn.Conv(self.dim, (3,), padding="SAME",
                    feature_group_count=self.dim, dtype=self.dtype,
                    name="tconv")(h)
        x = x + h
        if self.fuse_chanff:
            from pips_tpu.kernels.mixer_pallas import (chan_ff_block,
                                                       chan_ff_reference)
            s_, b_ = _LNParams(name="cnorm")(self.dim)
            w1, b1, w2, b2 = _ChanFFParams(self.dim, self.expansion,
                                           name="cff")()
            R, S_, D_ = x.shape
            fn = chan_ff_reference if self.is_initializing() else chan_ff_block
            x = fn(x.reshape(R * S_, D_), s_, b_, w1, b1, w2,
                   b2).reshape(R, S_, D_)
        else:
            x = x + ChannelMixFF(self.dim, self.expansion, dtype=self.dtype,
                                 name="cff")(LN("cnorm")(x).astype(x.dtype))
        return x


class TemporalRefiner(nn.Module):
    """(fhid, fcorr, flow_sincos) -> per-frame (Delta xy, Delta feat).

    The embed matmul consumes the parts separately against slices of one
    kernel (concat-free, like MLPMixer); the head is PER-FRAME
    (``Dense(latent+2)``), not the mixer's flattened S-dependent head."""
    latent_dim: int = 128
    dim: int = 256
    depth: int = 6
    expansion: int = 4
    dtype: Any = None
    fuse_chanff: bool = False

    @nn.compact
    def __call__(self, parts):  # tuple of (R, S, d_i)
        input_dim = sum(p.shape[-1] for p in parts)
        w, b = _DenseParams(self.dim, name="embed")(input_dim)
        cd = self.dtype or parts[0].dtype
        wc = w.astype(cd)
        acc, off = None, 0
        for p in parts:
            k = p.shape[-1]
            term = p.astype(cd) @ wc[off:off + k]
            off += k
            acc = term if acc is None else acc + term
        x = acc + b.astype(cd)
        for d in range(self.depth):
            x = TemporalBlock(self.dim, self.expansion, dtype=self.dtype,
                              fuse_chanff=self.fuse_chanff,
                              name=f"block{d}")(x)
        x = LN("final_norm")(x).astype(x.dtype)
        return nn.Dense(self.latent_dim + 2, dtype=self.dtype,
                        name="head")(x)  # (R, S, latent+2)


class Pips2(nn.Module):
    """S-agnostic PIPs++ tracker. Same encode/track split and corr paths as
    ``Pips``; accepts windows of ANY length with one parameter set."""
    stride: int = 8
    latent_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 3
    refiner_dim: int = 256
    refiner_depth: int = 6
    dtype: Any = None
    fuse_chanff: bool = False

    def setup(self):
        self.fnet = BasicEncoder(output_dim=self.latent_dim, stride=self.stride,
                                 dtype=self.dtype)
        self.refiner = TemporalRefiner(
            latent_dim=self.latent_dim, dim=self.refiner_dim,
            depth=self.refiner_depth, dtype=self.dtype,
            fuse_chanff=self.fuse_chanff)
        self.ffeat_norm = nn.LayerNorm(epsilon=1e-5)
        self.ffeat_updater = nn.Dense(self.latent_dim)
        self.vis_predictor = nn.Dense(1)

    def encode(self, rgbs: jnp.ndarray) -> jnp.ndarray:
        B, S, H, W, C_in = rgbs.shape
        x = 2.0 * (rgbs / 255.0) - 1.0
        fmaps = self.fnet(x.reshape(B * S, H, W, C_in))
        return fmaps.reshape(B, S, fmaps.shape[1], fmaps.shape[2],
                             self.latent_dim)

    def track(self, fmaps: jnp.ndarray, xys: jnp.ndarray,
              coords_init: Optional[jnp.ndarray] = None,
              feat_init: Optional[jnp.ndarray] = None,
              iters: int = 3, is_train: bool = False,
              use_fused_corr: bool = False,
              corr_mode: Optional[str] = None) -> PipsOutput:
        B, S, H8, W8, C = fmaps.shape
        N = xys.shape[1]
        xys_ = xys / float(self.stride)
        coords = (jnp.broadcast_to(xys_[:, None], (B, S, N, 2))
                  if coords_init is None else coords_init / float(self.stride))
        pyramid = build_fmap_pyramid(fmaps, self.corr_levels)
        if feat_init is None:
            ffeat = bilinear_sample2d(fmaps[:, 0], coords[:, 0, :, 0],
                                      coords[:, 0, :, 1])
        else:
            ffeat = feat_init
        ffeats = jnp.broadcast_to(ffeat[:, None], (B, S, N, C))
        coords_bak = coords
        # normalized time channel: S-agnostic (the mixer's raw 0..S ramp
        # would shift scale with window length)
        times = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, S).reshape(1, S, 1), (B * N, S, 1))

        coord_predictions = []
        coord_predictions2 = [coords * self.stride, coords * self.stride]
        for _ in range(iters):
            coords = jax.lax.stop_gradient(coords)
            mode = corr_mode or ("fused" if use_fused_corr else "full")
            if mode == "fused":
                fcorrs = fused_corr_sample(pyramid, ffeats, coords,
                                           self.corr_radius)
            elif mode == "onehot":
                from pips_tpu.kernels.corr_pallas import sample_corr_onehot
                corrs = [c.astype(fmaps.dtype)
                         for c in corr_pyramid(pyramid, ffeats)]
                fcorrs = sample_corr_onehot(corrs, coords, self.corr_radius)
            else:
                corrs = corr_pyramid(pyramid, ffeats)
                fcorrs = sample_corr_pyramid(corrs, coords, self.corr_radius)

            LRR = fcorrs.shape[-1]
            fcorrs_ = jnp.swapaxes(fcorrs, 1, 2).reshape(B * N, S, LRR)
            flows_ = jnp.swapaxes(coords - coords[:, 0:1], 1, 2).reshape(B * N, S, 2)
            flows_ = jnp.concatenate([flows_, times], axis=2)
            flow_sincos = get_3d_embedding(flows_, 64, cat_coords=True)
            ffeats_ = jnp.swapaxes(ffeats, 1, 2).reshape(B * N, S, C)

            delta = self.refiner((ffeats_, fcorrs_, flow_sincos))
            delta_coords_ = delta[:, :, :2]
            delta_feats_ = delta[:, :, 2:].reshape(B * N * S, C)
            ffeats_flat = ffeats_.reshape(B * N * S, C)
            ffeats_flat = gelu(self.ffeat_updater(
                self.ffeat_norm(delta_feats_))) + ffeats_flat
            ffeats = jnp.swapaxes(
                ffeats_flat.astype(fmaps.dtype).reshape(B, N, S, C), 1, 2)
            coords = coords + jnp.swapaxes(
                delta_coords_.astype(jnp.float32).reshape(B, N, S, 2), 1, 2)
            if not is_train:
                coords = coords.at[:, 0].set(coords_bak[:, 0])
            coord_predictions.append(coords * self.stride)
            coord_predictions2.append(coords * self.stride)

        vis_e = self.vis_predictor(
            ffeats.reshape(B * S * N, C).astype(jnp.float32)).reshape(B, S, N)
        coord_predictions2 += [coords * self.stride, coords * self.stride]
        return PipsOutput(
            coord_predictions=jnp.stack(coord_predictions),
            coord_predictions2=jnp.stack(coord_predictions2),
            vis_e=vis_e, ffeat=ffeat, fcps=None,
            ce_loss=None,  # PIPs++ trains without the CE term (train2.py:81)
        )

    def __call__(self, xys: jnp.ndarray, rgbs: jnp.ndarray,
                 coords_init: Optional[jnp.ndarray] = None,
                 feat_init: Optional[jnp.ndarray] = None,
                 iters: int = 3, is_train: bool = False,
                 compute_fcp: bool = False, use_fused_corr: bool = False,
                 corr_mode: Optional[str] = None,
                 ce_gt: Optional[tuple] = None) -> PipsOutput:
        """Same calling convention as ``Pips`` (compute_fcp/ce_gt accepted
        for drop-in train-loop compatibility; PIPs++ has no score-map CE,
        so they are ignored and ``ce_loss`` is None)."""
        del compute_fcp, ce_gt
        fmaps = self.encode(rgbs)
        return self.track(fmaps, xys, coords_init=coords_init,
                          feat_init=feat_init, iters=iters, is_train=is_train,
                          use_fused_corr=use_fused_corr, corr_mode=corr_mode)
