"""Pips: persistent-point tracking over S-frame windows.

Capability parity with reference ``nets/pips.py:400-611``: encode the window,
initialize each query point's trajectory at zero velocity, then run ``iters``
MLP-Mixer refinement updates over multi-scale correlation patches, and read
visibility logits off the final point features.

TPU-first structure:
  * ``encode`` / ``track`` are separate so long-video chaining can encode all
    frames once and re-run only the refinement per window
    (see ``pips_tpu.inference.chain``).
  * the refinement loop is statically unrolled under jit; coords are
    ``stop_gradient``-ed at each iteration start (reference ``nets/pips.py:500``).
  * eval locks the frame-0 coordinate after every update
    (reference ``nets/pips.py:535-536``); train does not.
  * four numerically-equivalent corr+sample execution paths are selectable
    via ``corr_mode`` (see ``track``); training accumulates the score-map CE
    loss inside the loop (``ce_gt``) so the (B, S, I, N, H8, W8) stack —
    the reference's training memory hot spot — is never materialized.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pips_tpu.models.encoder import BasicEncoder
from pips_tpu.models.mixer import DeltaBlock, gelu
from pips_tpu.ops.corr import (build_fmap_pyramid, corr_pyramid, fcp_from_fused,
                               fused_corr_sample, fused_pyramid_fmap,
                               sample_corr_pyramid)
from pips_tpu.ops.samp import bilinear_sample2d


class PipsOutput(NamedTuple):
    coord_predictions: jnp.ndarray   # (I, B, S, N, 2) pixel coords, one per refinement iter
    coord_predictions2: jnp.ndarray  # (I+4, B, S, N, 2) vis-friendly padded sequence
    vis_e: jnp.ndarray               # (B, S, N) visibility logits
    ffeat: jnp.ndarray               # (B, N, C) frame-0 appearance feature (chaining anchor)
    fcps: Optional[jnp.ndarray]      # (B, S, I, N, H8, W8) train-time score maps or None
    ce_loss: Optional[jnp.ndarray] = None  # score-map CE accumulated in-loop (memory-lean)


class Pips(nn.Module):
    S: int = 8
    stride: int = 8
    latent_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 3
    mixer_dim: int = 512
    mixer_depth: int = 12
    dtype: Any = None  # compute dtype (e.g. jnp.bfloat16); params stay float32.
                       # Coordinates, norms, and corr accumulation remain f32.
    remat_mixer: bool = False  # rematerialize the DeltaBlock on backward —
                               # its FF activations are the training memory
                               # hot spot at large B*N (surgical alternative
                               # to whole-step remat)
    remat_corr: bool = False   # rematerialize the per-iteration corr volumes
                               # ((B,S,N,H,W) x levels x iters) on backward
    remat_encoder: bool = False  # per-block encoder remat: drops the encoder
                                 # backward working set to one tensor per
                                 # stage (full-batch production step fits a
                                 # single chip; see encoder.BasicEncoder)
    fuse_chanff: bool = False  # fused Pallas channel-FF mixer blocks
                               # (kernels/mixer_pallas.py): one kernel +
                               # custom VJP per block, weights VMEM-resident.
                               # Enable on the TPU bf16 compute path.
    fuse_conv3: bool = False   # fused implicit-im2col Pallas kernel for the
                               # encoder's small-channel 3x3 convs
                               # (kernels/conv_pallas.py): dense-K MXU
                               # contraction where XLA's per-tap strategy
                               # runs half-empty. TPU-only.
    full_s2d: bool = True      # bf16 + W%4==0: run encoder stage 1 fully in
                               # the W-s2d layout (stem emits it, layer2_0
                               # consumes it) — no stage-boundary relayout.
                               # Exact math; see encoder.BasicEncoder.

    def setup(self):
        self.fnet = BasicEncoder(output_dim=self.latent_dim, stride=self.stride,
                                 dtype=self.dtype, remat=self.remat_encoder,
                                 fuse_conv3=self.fuse_conv3,
                                 full_s2d=self.full_s2d)
        delta_cls = nn.remat(DeltaBlock) if self.remat_mixer else DeltaBlock
        self.delta_block = delta_cls(
            latent_dim=self.latent_dim,
            corr_levels=self.corr_levels,
            corr_radius=self.corr_radius,
            S=self.S,
            mixer_dim=self.mixer_dim,
            mixer_depth=self.mixer_depth,
            dtype=self.dtype,
            fuse_chanff=self.fuse_chanff,
        )
        # GroupNorm(1, C) on (B*, C) == LayerNorm over C with affine, eps 1e-5
        self.ffeat_norm = nn.LayerNorm(epsilon=1e-5)
        self.ffeat_updater = nn.Dense(self.latent_dim)
        self.vis_predictor = nn.Dense(1)

    def encode(self, rgbs: jnp.ndarray) -> jnp.ndarray:
        """rgbs: (B, S, H, W, 3) in [0, 255] -> fmaps (B, S, H8, W8, C)."""
        B, S, H, W, C_in = rgbs.shape
        x = 2.0 * (rgbs / 255.0) - 1.0
        fmaps = self.fnet(x.reshape(B * S, H, W, C_in))
        H8, W8 = fmaps.shape[1], fmaps.shape[2]
        return fmaps.reshape(B, S, H8, W8, self.latent_dim)

    def track(self, fmaps: jnp.ndarray, xys: jnp.ndarray,
              coords_init: Optional[jnp.ndarray] = None,
              feat_init: Optional[jnp.ndarray] = None,
              iters: int = 3, is_train: bool = False,
              compute_fcp: bool = False, use_fused_corr: bool = False,
              corr_mode: Optional[str] = None,
              ce_gt: Optional[tuple] = None) -> PipsOutput:
        """Refinement on precomputed feature maps.

        fmaps: (B, S, H8, W8, C); xys: (B, N, 2) query pixel coords in frame 0;
        coords_init: (B, S, N, 2) pixel coords; feat_init: (B, N, C).

        corr_mode selects the corr+sample execution path (all numerically
        equivalent): 'full' (reference-style score maps then bilinear
        sampling), 'fused' (gather-based, no score maps), 'onehot'
        (gather-free matmul sampling of score maps), 'pallas' (fused TPU
        kernel, VMEM-resident score tiles). Default: 'fused' when
        ``use_fused_corr`` else 'full'.

        ce_gt: optional (trajs_g_pix, vis_g, valids); when given with
        ``compute_fcp``, the score-map CE loss is accumulated inside the
        refinement loop (returned as ``ce_loss``) and the (B,S,I,N,H8,W8)
        fcps stack is NOT materialized — the reference's training memory
        hot spot.
        """
        B, S, H8, W8, C = fmaps.shape
        assert S == self.S
        N = xys.shape[1]

        xys_ = xys / float(self.stride)
        if coords_init is None:
            coords = jnp.broadcast_to(xys_[:, None], (B, S, N, 2))
        else:
            coords = coords_init / float(self.stride)

        pyramid = build_fmap_pyramid(fmaps, self.corr_levels)

        if feat_init is None:
            ffeat = bilinear_sample2d(fmaps[:, 0], coords[:, 0, :, 0], coords[:, 0, :, 1])
        else:
            ffeat = feat_init  # (B, N, C)
        ffeats = jnp.broadcast_to(ffeat[:, None], (B, S, N, C))

        coords_bak = coords

        # train-time score maps come from ONE einsum against the fused
        # pyramid map (linearity of corr+resize; see ops.corr.fused_pyramid_
        # fmap) instead of per-iteration upsampling of per-point volumes
        fm_fcp = fused_pyramid_fmap(pyramid, (H8, W8)) if compute_fcp else None

        times = jnp.broadcast_to(
            jnp.linspace(0.0, float(S), S).reshape(1, S, 1), (B * N, S, 1))

        coord_predictions = []
        coord_predictions2 = [coords * self.stride, coords * self.stride]
        fcps = []
        ce_acc = []

        for _ in range(iters):
            coords = jax.lax.stop_gradient(coords)

            mode = corr_mode or ("fused" if use_fused_corr else "full")
            if compute_fcp:
                # one-hot patch sampling: same values as the grid-sample
                # gather, but its transpose is a matmul rather than a scatter
                # (gather backward dominates the train step otherwise)
                from pips_tpu.kernels.corr_pallas import sample_corr_onehot

                def corr_chunk(ffeats_c, coords_c):
                    corrs = corr_pyramid(pyramid, ffeats_c)
                    # score volumes feed only the patch sampler; in mixed
                    # precision write them bf16 (XLA fuses the convert into
                    # the dot output) — halves the step's largest HBM tensor
                    corrs = [c.astype(fmaps.dtype) for c in corrs]
                    # fcp also materializes in the compute dtype (convert
                    # fuses into the dot output); the CE loss upcasts
                    # pointwise inside its fused reduction
                    fcp = fcp_from_fused(fm_fcp, ffeats_c).astype(fmaps.dtype)
                    fc = sample_corr_onehot(corrs, coords_c, self.corr_radius)
                    return fcp, fc

                if self.remat_corr:  # recompute score volumes on backward
                    corr_chunk = jax.checkpoint(corr_chunk)
                fcp, fcorrs = corr_chunk(ffeats, coords)
                if ce_gt is not None:
                    from pips_tpu.models.losses import score_map_loss_single_iter
                    trajs_g_pix, vis_g, valids = ce_gt
                    ce_acc.append(score_map_loss_single_iter(
                        fcp, trajs_g_pix / float(self.stride), vis_g, valids))
                else:
                    fcps.append(fcp)
            elif mode == "fused":
                fcorrs = fused_corr_sample(pyramid, ffeats, coords, self.corr_radius)
            elif mode == "onehot":
                from pips_tpu.kernels.corr_pallas import sample_corr_onehot
                corrs = [c.astype(fmaps.dtype)
                         for c in corr_pyramid(pyramid, ffeats)]
                fcorrs = sample_corr_onehot(corrs, coords, self.corr_radius)
            elif mode == "pallas":
                from pips_tpu.kernels.corr_pallas import corr_sample_pallas
                fcorrs = corr_sample_pallas(pyramid, ffeats, coords, self.corr_radius)
            else:
                corrs = corr_pyramid(pyramid, ffeats)
                fcorrs = sample_corr_pyramid(corrs, coords, self.corr_radius)

            LRR = fcorrs.shape[-1]
            # mixer layout: (B*N, S, ·)
            fcorrs_ = jnp.swapaxes(fcorrs, 1, 2).reshape(B * N, S, LRR)
            flows_ = jnp.swapaxes(coords - coords[:, 0:1], 1, 2).reshape(B * N, S, 2)
            flows_ = jnp.concatenate([flows_, times], axis=2)  # (B*N, S, 3)
            ffeats_ = jnp.swapaxes(ffeats, 1, 2).reshape(B * N, S, C)

            delta_all_ = self.delta_block(ffeats_, fcorrs_, flows_)  # (B*N, S, C+2)
            delta_coords_ = delta_all_[:, :, :2]
            delta_feats_ = delta_all_[:, :, 2:].reshape(B * N * S, C)

            ffeats_flat = ffeats_.reshape(B * N * S, C)
            ffeats_flat = gelu(self.ffeat_updater(self.ffeat_norm(delta_feats_))) + ffeats_flat
            # keep features in the compute dtype so the next iteration's corr
            # runs on native-MXU inputs
            ffeats = jnp.swapaxes(
                ffeats_flat.astype(fmaps.dtype).reshape(B, N, S, C), 1, 2)

            coords = coords + jnp.swapaxes(
                delta_coords_.astype(jnp.float32).reshape(B, N, S, 2), 1, 2)

            if not is_train:
                coords = coords.at[:, 0].set(coords_bak[:, 0])  # lock query frame

            coord_predictions.append(coords * self.stride)
            coord_predictions2.append(coords * self.stride)

        vis_e = self.vis_predictor(
            ffeats.reshape(B * S * N, C).astype(jnp.float32)).reshape(B, S, N)

        coord_predictions2.append(coords * self.stride)
        coord_predictions2.append(coords * self.stride)

        return PipsOutput(
            coord_predictions=jnp.stack(coord_predictions),
            coord_predictions2=jnp.stack(coord_predictions2),
            vis_e=vis_e,
            ffeat=ffeat,
            fcps=jnp.stack(fcps, axis=2) if fcps else None,  # (B, S, I, N, H8, W8)
            ce_loss=sum(ce_acc) / len(ce_acc) if ce_acc else None,
        )

    def __call__(self, xys: jnp.ndarray, rgbs: jnp.ndarray,
                 coords_init: Optional[jnp.ndarray] = None,
                 feat_init: Optional[jnp.ndarray] = None,
                 iters: int = 3, is_train: bool = False,
                 compute_fcp: bool = False, use_fused_corr: bool = False,
                 corr_mode: Optional[str] = None,
                 ce_gt: Optional[tuple] = None) -> PipsOutput:
        """Full forward: encode + track (reference ``Pips.forward`` signature analog)."""
        fmaps = self.encode(rgbs)
        return self.track(fmaps, xys, coords_init=coords_init, feat_init=feat_init,
                          iters=iters, is_train=is_train, compute_fcp=compute_fcp,
                          use_fused_corr=use_fused_corr, corr_mode=corr_mode,
                          ce_gt=ce_gt)
