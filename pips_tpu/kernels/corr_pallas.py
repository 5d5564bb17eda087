"""TPU kernels for the corr-pyramid hot path.

Two alternative device-side strategies for per-point patch extraction (the
reference's ``CorrBlock.sample``, our ``pips_tpu.ops.corr``), both avoiding
XLA's scattered-gather lowering:

* ``sample_corr_onehot`` — pure-XLA one-hot formulation: row/column selection
  of the (2r+2)^2 integer patch becomes two small batched matmuls against
  iota-built one-hot matrices. No gather anywhere; everything is MXU/VPU
  work. Mathematically identical to ``sample_corr_pyramid`` (zero padding via
  one-hot columns that select nothing out of bounds).

* ``corr_sample_pallas`` — a Pallas kernel that fuses corr computation and
  patch extraction per (frame, point-tile) grid step: the feature-map level
  is staged in VMEM once per frame, the (TN, C) x (C, H*W) score matmul runs
  on the MXU into VMEM scratch, and the one-hot patch selection contracts in
  VMEM — the (B, S, N, H, W) score volume never touches HBM (the reference's
  memory hot spot at dense N, ``nets/pips.py:384-398``).

Both produce patches in the reference's transposed offset ordering
(patch[i, j] ~ (x + o_i, y + o_j), i-major flatten).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _integer_patch_onehots(coords: jnp.ndarray, H: int, W: int, radius: int):
    """coords: (..., 2) at this level's scale.

    Returns (oy, ox, wx, wy): one-hot selectors (..., G, H) / (..., G, W) with
    out-of-bounds rows all-zero (zero padding), and fractional weights.
    """
    r = radius
    G = 2 * r + 2
    x = coords[..., 0]
    y = coords[..., 1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    a = jnp.arange(G, dtype=jnp.int32)
    rows = y0[..., None] - r + a  # (..., G)
    cols = x0[..., None] - r + a
    hh = jnp.arange(H, dtype=jnp.int32)
    ww = jnp.arange(W, dtype=jnp.int32)
    oy = (rows[..., :, None] == hh).astype(jnp.float32)  # (..., G, H)
    ox = (cols[..., :, None] == ww).astype(jnp.float32)  # (..., G, W)
    return oy, ox, wx, wy


def _bilinear_from_integer_patch(g: jnp.ndarray, wx: jnp.ndarray, wy: jnp.ndarray,
                                 radius: int) -> jnp.ndarray:
    """g: (..., G, G) integer scores [row a, col b]; returns (..., P*P) in the
    reference's transposed ordering."""
    P = 2 * radius + 1
    G = P + 1
    wxe = wx[..., None, None]
    wye = wy[..., None, None]
    interp = ((1 - wye) * (1 - wxe) * g[..., 0:P, 0:P]
              + (1 - wye) * wxe * g[..., 0:P, 1:G]
              + wye * (1 - wxe) * g[..., 1:G, 0:P]
              + wye * wxe * g[..., 1:G, 1:G])  # indexed [j, i]
    interp = jnp.swapaxes(interp, -1, -2)
    return interp.reshape(*g.shape[:-2], P * P)


def sample_corr_onehot(corrs: list[jnp.ndarray], coords: jnp.ndarray,
                       radius: int = 3) -> jnp.ndarray:
    """Gather-free equivalent of ``ops.corr.sample_corr_pyramid``.

    corrs: list of (B, S, N, H_l, W_l); coords: (B, S, N, 2) level-0 scale.
    """
    out = []
    for lvl, corr in enumerate(corrs):
        H, W = corr.shape[-2], corr.shape[-1]
        c = coords / (2.0 ** lvl)
        oy, ox, wx, wy = _integer_patch_onehots(c, H, W, radius)
        # row-select then column-select: two batched matmuls. One-hot values
        # (0/1) are exact in any dtype; selection sums pick single elements,
        # so matching the score maps' dtype (bf16 in mixed precision) costs
        # no accuracy and halves the volume read.
        oy = oy.astype(corr.dtype)
        ox = ox.astype(corr.dtype)
        rows = jnp.einsum("bsngh,bsnhw->bsngw", oy, corr)
        g = jnp.einsum("bsnkw,bsngw->bsngk", ox, rows)
        out.append(_bilinear_from_integer_patch(g, wx, wy, radius))
    return jnp.concatenate(out, axis=-1)


def _corr_sample_kernel(coords_ref, fmap_ref, targets_ref, out_ref, corr_scratch,
                        *, H: int, W: int, Wp: int, C: int, TN: int,
                        radius: int, scale: float):
    """Grid step (s, n_tile): fmap (H*Wp, C) and targets (TN, C) in VMEM.

    ``W`` is the level's real width; ``Wp`` the lane-aligned (128-multiple)
    padded width the caller zero-pads the feature map to. Padding keeps every
    level on the cheap path: G one-hot ROW selections over the (TN, H, Wp)
    score tile + G^2 (TN, Wp) column reductions. (The pre-padding fallback did
    G^2 = 64 masked reductions over the FULL flat tile on non-aligned levels —
    measured as the kernel's dominant cost.) Zero-padded fmap columns produce
    zero scores and the column one-hots never select x >= W, so results are
    unchanged.

    Mosaic-constraint notes: 3D broadcast-compares, minor-dim reshapes of
    small tiles, in-kernel gathers, and batched dot_generals are all rejected
    by the TPU compiler; everything below is 2D iota/compare + statically
    unrolled masked reductions after one MXU matmul.
    """
    r = radius
    P = 2 * r + 1
    G = P + 1  # integer patch side
    acc_dtype = corr_scratch.dtype

    # MXU: scores for the whole level, kept in VMEM scratch (never to HBM).
    # Mosaic requires a 32-bit matmul accumulator; the scratch is also f32
    # (callers pass acc_dtype=f32 — a bf16 scratch measured worse, see
    # corr_sample_pallas_level).
    corr_scratch[:] = (jax.lax.dot_general(
        targets_ref[0], fmap_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale).astype(acc_dtype)  # (TN, H*Wp)

    c = coords_ref[0]  # (TN, 2)
    x0f = jnp.floor(c[:, 0:1])
    y0f = jnp.floor(c[:, 1:2])
    wx = (c[:, 0:1] - x0f)  # (TN, 1)
    wy = (c[:, 1:2] - y0f)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    g = [[None] * G for _ in range(G)]
    m3 = corr_scratch[:].reshape(TN, H, Wp)
    hh = jax.lax.broadcasted_iota(jnp.int32, (TN, H), 1)
    ww = jax.lax.broadcasted_iota(jnp.int32, (TN, Wp), 1)
    # masks stay f32: Mosaic rejects bf16 minor-dim-1 reshapes/broadcasts;
    # the savings come from the (TN, H, Wp) score tile itself being bf16
    rows = []  # per patch row a: (TN, Wp), zero outside bounds
    for a in range(G):
        yy = y0 - r + a  # (TN, 1)
        oy = ((hh == yy) & (yy >= 0) & (yy <= H - 1)).astype(jnp.float32)
        rows.append(jnp.sum(m3 * oy[:, :, None], axis=1))
    for b in range(G):
        xx = x0 - r + b
        ox = ((ww == xx) & (xx >= 0) & (xx <= W - 1)).astype(jnp.float32)
        for a in range(G):
            # exactly one nonzero element per row -> no accumulation error
            g[a][b] = jnp.sum(rows[a] * ox, axis=1, keepdims=True)

    # bilinear combine; out[i, j] = sample at (x + o_i, y + o_j) uses
    # g[j..j+1][i..i+1] (reference transposed offset ordering), i-major
    pieces = []
    for i in range(P):
        for j in range(P):
            pieces.append((1 - wy) * (1 - wx) * g[j][i]
                          + (1 - wy) * wx * g[j][i + 1]
                          + wy * (1 - wx) * g[j + 1][i]
                          + wy * wx * g[j + 1][i + 1])
    out_ref[0] = jnp.concatenate(pieces, axis=1)  # (TN, P*P)


def _pick_tile_n(tile_n: int, N: int, H: int, Wp: int, C: int,
                 item: int, budget_bytes: int = 10 * 1024 * 1024) -> int:
    """Largest power-of-two tile that keeps (double-buffered fmap block +
    score scratch + iota/mask temporaries) under the VMEM budget."""
    fmap_bytes = 2 * H * Wp * C * item  # double-buffered across grid steps
    per_point = H * Wp * item * 3       # scratch + iota + mask temporary
    tn = min(tile_n, N)
    while tn > 8 and fmap_bytes + tn * per_point > budget_bytes:
        tn //= 2
    return max(tn, 8)


def corr_sample_pallas_level(fmap: jnp.ndarray, targets: jnp.ndarray,
                             coords: jnp.ndarray, radius: int = 3,
                             tile_n: int = 128) -> jnp.ndarray:
    """One pyramid level, batch folded: fmap (S, H, W, C), targets (S, N, C),
    coords (S, N, 2) at THIS level's scale -> (S, N, P*P).

    The level is zero-padded to a lane-aligned width (Wp = next multiple of
    128) so the in-kernel score tile reshapes cleanly; scores in the padding
    are zero and never selected. The score scratch is f32 regardless of the
    feature dtype — see the acc_dtype comment below (a bf16 scratch was
    tried and lost: Mosaic upcasts it on the stack and OOMs scoped VMEM).
    """
    S, H, W, C = fmap.shape
    N = targets.shape[1]
    P = 2 * radius + 1
    Wp = -(-W // 128) * 128
    # scratch stays f32: Mosaic needs f32 matmul accumulators and rejects
    # bf16 minor-dim broadcasts, so a bf16 tile would be upcast on the stack
    # anyway (measured: it OOMs scoped VMEM instead of saving)
    acc_dtype = jnp.float32
    TN = _pick_tile_n(tile_n, N, H, Wp, C, 4)
    if N % TN:  # pad points up to a tile multiple
        pad = TN - N % TN
        targets = jnp.concatenate([targets, targets[:, :1].repeat(pad, 1)], 1)
        coords = jnp.concatenate([coords, coords[:, :1].repeat(pad, 1)], 1)
        out = corr_sample_pallas_level(fmap, targets, coords, radius, TN)
        return out[:, :N]
    scale = 1.0 / math.sqrt(C)
    if Wp != W:
        fmap = jnp.pad(fmap, ((0, 0), (0, 0), (0, Wp - W), (0, 0)))

    kernel = functools.partial(_corr_sample_kernel, H=H, W=W, Wp=Wp, C=C,
                               TN=TN, radius=radius, scale=scale)
    grid = (S, N // TN)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TN, 2), lambda s, n: (s, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H * Wp, C), lambda s, n: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN, C), lambda s, n: (s, n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TN, P * P), lambda s, n: (s, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, N, P * P), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TN, H * Wp), acc_dtype)],
    )(coords.reshape(S, N, 2), fmap.reshape(S, H * Wp, C), targets)


def corr_sample_pallas(pyramid: list[jnp.ndarray], targets: jnp.ndarray,
                       coords: jnp.ndarray, radius: int = 3,
                       tile_n: int = 128) -> jnp.ndarray:
    """Drop-in fused corr+sample (matches ``ops.corr.fused_corr_sample``).

    pyramid: list of (B, S, H_l, W_l, C); targets (B, S, N, C);
    coords (B, S, N, 2) level-0 scale -> (B, S, N, L*(2r+1)^2).
    """
    B, S, N, C = targets.shape
    out = []
    for lvl, fm in enumerate(pyramid):
        _, _, H, W, _ = fm.shape
        res = corr_sample_pallas_level(
            fm.reshape(B * S, H, W, C),
            targets.reshape(B * S, N, C),
            (coords / (2.0 ** lvl)).reshape(B * S, N, 2),
            radius=radius, tile_n=tile_n)
        out.append(res.reshape(B, S, N, -1))
    return jnp.concatenate(out, axis=-1)
