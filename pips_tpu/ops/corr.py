"""Multi-scale per-point correlation (the PIPs hot op).

Capability parity with reference ``nets/pips.py:335-398`` (``CorrBlock``):
  * pyramid: L levels of 2x2-avg-pooled feature maps;
  * ``corr``: per-point score maps ``dot(target_feat, fmap)/sqrt(C)``;
  * ``sample``: bilinear lookup of a (2r+1)^2 patch per level at the current
    coords, with the reference's transposed offset ordering
    (patch[i, j] is sampled at ``(x + o_i, y + o_j)`` — offsets added to x
    vary along the *first* patch axis; see ``nets/pips.py:369-375`` where the
    meshgrid'd (dy, dx) pair is added to (x, y)).

Two execution paths with identical math (up to fp reassociation):

1. ``corr_pyramid`` + ``sample_corr_pyramid`` — materializes full
   (B, S, N, H_l, W_l) score maps, exactly like the reference. Needed at
   train time anyway (the score-map CE loss consumes full maps).

2. ``fused_corr_sample`` — TPU-first: because the patch offsets are integers,
   all (2r+1)^2 taps share one fractional offset, so the bilinear patch
   equals a bilinear combination of a (2r+2)^2 *integer* score patch; and
   since corr is linear in the feature map, that patch is
   ``dot(target, gathered_fmap_patch)``. This never materializes the
   (B, S, N, H, W) maps — the reference's memory hot spot at dense N — and
   reduces HBM traffic from O(N*H*W) to O(N*(2r+2)^2*C) per level.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from pips_tpu.ops.resize import avg_pool2x2, resize_bilinear_align_corners
from pips_tpu.ops.samp import grid_sample_zeros


def build_fmap_pyramid(fmaps: jnp.ndarray, num_levels: int = 4) -> list[jnp.ndarray]:
    """fmaps: (B, S, H, W, C) -> list of ``num_levels`` maps, each 2x downsampled."""
    pyramid = [fmaps]
    for _ in range(num_levels - 1):
        fmaps = avg_pool2x2(fmaps)
        pyramid.append(fmaps)
    return pyramid


def corr_pyramid(pyramid: list[jnp.ndarray], targets: jnp.ndarray) -> list[jnp.ndarray]:
    """targets: (B, S, N, C) -> list of (B, S, N, H_l, W_l) score maps.

    The einsum contracts C on the MXU; accumulate in float32.
    """
    C = targets.shape[-1]
    scale = 1.0 / math.sqrt(C)
    # full-precision passes for f32 inputs (exactness); bf16 is MXU-native
    prec = (jax.lax.Precision.HIGHEST if targets.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    corrs = []
    for fm in pyramid:
        c = jnp.einsum("bsnc,bshwc->bsnhw", targets, fm,
                       preferred_element_type=jnp.float32, precision=prec)
        corrs.append(c * scale)
    return corrs


def _patch_offsets(radius: int) -> jnp.ndarray:
    """(2r+1,) integer offsets -r..r as float."""
    return jnp.arange(-radius, radius + 1, dtype=jnp.float32)


def sample_corr_pyramid(corrs: list[jnp.ndarray], coords: jnp.ndarray,
                        radius: int = 3) -> jnp.ndarray:
    """Reference-semantics patch sampling from full corr maps.

    corrs: list of (B, S, N, H_l, W_l); coords: (B, S, N, 2) xy at level-0
    scale. Returns (B, S, N, L*(2r+1)^2), levels concatenated, each patch
    flattened i-major where patch[i, j] ~ (x + o_i, y + o_j).
    """
    B, S, N, _ = coords.shape
    r = radius
    P = 2 * r + 1
    offs = _patch_offsets(r)
    out = []
    for lvl, corr in enumerate(corrs):
        H, W = corr.shape[3], corr.shape[4]
        c = coords / (2.0 ** lvl)  # (B,S,N,2)
        # patch sample points: x + o_i (axis i), y + o_j (axis j)
        x = c[..., 0:1, None] + offs[None, :, None]   # broadcast -> (B,S,N,P,1)
        y = c[..., 1:2, None] + offs[None, None, :]   # (B,S,N,1,P)
        x = jnp.broadcast_to(x[..., :, :], (B, S, N, P, P)).reshape(B * S * N, P * P)
        y = jnp.broadcast_to(y[..., :, :], (B, S, N, P, P)).reshape(B * S * N, P * P)
        img = corr.reshape(B * S * N, H, W, 1)
        patch = grid_sample_zeros(img, x, y)  # (BSN, P*P, 1)
        out.append(patch.reshape(B, S, N, P * P))
    return jnp.concatenate(out, axis=-1)


def fused_corr_sample(pyramid: list[jnp.ndarray], targets: jnp.ndarray,
                      coords: jnp.ndarray, radius: int = 3) -> jnp.ndarray:
    """Fused corr+sample: same output as corr_pyramid -> sample_corr_pyramid
    without materializing full score maps.

    pyramid: list of (B, S, H_l, W_l, C); targets: (B, S, N, C);
    coords: (B, S, N, 2) at level-0 scale.
    """
    B, S, N, C = targets.shape
    r = radius
    P = 2 * r + 1
    G = P + 1  # integer patch side
    scale = 1.0 / math.sqrt(C)
    out = []
    for lvl, fm in enumerate(pyramid):
        H, W = fm.shape[2], fm.shape[3]
        c = coords / (2.0 ** lvl)
        x, y = c[..., 0], c[..., 1]  # (B,S,N)
        x0f = jnp.floor(x)
        y0f = jnp.floor(y)
        wx = (x - x0f)[..., None, None]  # (B,S,N,1,1)
        wy = (y - y0f)[..., None, None]
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)

        a = jnp.arange(G, dtype=jnp.int32)
        yy = y0[..., None] - r + a          # (B,S,N,G) integer rows
        xx = x0[..., None] - r + a          # (B,S,N,G) integer cols
        valid = ((yy[..., :, None] >= 0) & (yy[..., :, None] <= H - 1)
                 & (xx[..., None, :] >= 0) & (xx[..., None, :] <= W - 1))  # (B,S,N,G,G)
        yyc = jnp.clip(yy, 0, H - 1)
        xxc = jnp.clip(xx, 0, W - 1)
        flat_idx = (yyc[..., :, None] * W + xxc[..., None, :]).reshape(B, S, N * G * G)

        fm_flat = fm.reshape(B, S, H * W, C)
        patch = jnp.take_along_axis(fm_flat, flat_idx[..., None], axis=2)
        patch = patch.reshape(B, S, N, G, G, C)
        patch = patch * valid[..., None].astype(patch.dtype)

        # integer score patch g[a, b] = corr at (y0-r+a, x0-r+b)
        prec = (jax.lax.Precision.HIGHEST if targets.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        g = jnp.einsum("bsnghc,bsnc->bsngh", patch, targets,
                       preferred_element_type=jnp.float32,
                       precision=prec) * scale  # (B,S,N,G,G)

        interp = ((1 - wy) * (1 - wx) * g[..., 0:P, 0:P]
                  + (1 - wy) * wx * g[..., 0:P, 1:G]
                  + wy * (1 - wx) * g[..., 1:G, 0:P]
                  + wy * wx * g[..., 1:G, 1:G])  # indexed [j, i]
        # reference ordering: patch[i, j] ~ (x + o_i, y + o_j) -> transpose
        interp = jnp.swapaxes(interp, -1, -2)  # now [i, j]
        out.append(interp.reshape(B, S, N, P * P))
    return jnp.concatenate(out, axis=-1)


def fused_pyramid_fmap(pyramid: list[jnp.ndarray], out_hw: tuple[int, int]) -> jnp.ndarray:
    """Sum of pyramid levels, each align-corners-upsampled to ``out_hw``.

    Key linearity identity: corr is linear in the feature map and the
    align-corners resize is linear over (h, w), so the train-time score maps
    ``sum_l resize(corr_l)`` (reference ``nets/pips.py:504-510``) equal a
    single corr einsum against this fused map. Computing the fused map ONCE
    per window replaces per-iteration upsampling of L-1 per-point
    (B, S, N, H8, W8) score volumes — the train step's HBM hot spot — with
    one (B, S, H8, W8, C) tensor a few MB in size.

    pyramid: list of (B, S, H_l, W_l, C) -> (B, S, H8, W8, C).
    """
    acc = None
    for fm in pyramid:
        up = resize_bilinear_align_corners(fm, out_hw)
        acc = up if acc is None else acc + up
    return acc


def fcp_from_fused(fm_fcp: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """fcp score maps from the fused pyramid map: (B,S,N,H8,W8) f32 logits.

    Numerically equal (up to fp reassociation) to
    ``fcp_score_maps(corr_pyramid(pyramid, targets), out_hw)``.
    """
    return corr_pyramid([fm_fcp], targets)[0]


def fcp_score_maps(corrs: list[jnp.ndarray], out_hw: tuple[int, int]) -> jnp.ndarray:
    """Sum of corr levels, each align-corners-upsampled to ``out_hw``.

    Parity with reference ``nets/pips.py:504-510`` (train-time score maps for
    the CE loss). corrs: list of (B, S, N, H_l, W_l) -> (B, S, N, H8, W8).
    """
    B, S, N = corrs[0].shape[:3]
    H8, W8 = out_hw
    fcp = jnp.zeros((B, S, N, H8, W8), dtype=jnp.float32)
    for c in corrs:
        # resize expects (..., H, W, C)
        up = resize_bilinear_align_corners(c[..., None], (H8, W8))[..., 0]
        fcp = fcp + up
    return fcp
