"""Single-window inference wrapper (reference ``demo.py:21-77`` analog).

Jits one fixed-shape forward per (N, H, W) config; exposes grid-query helpers.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pips_tpu.models import Pips
from pips_tpu.ops.grids import gridcloud2d


def grid_queries(H: int, W: int, grid_y: int = 16, grid_x: int = 16,
                 margin: int = 8) -> np.ndarray:
    """(1, grid_y*grid_x, 2) xy query grid with a pixel margin
    (reference ``demo.py:32-36``)."""
    ys = np.linspace(margin, H - margin, grid_y)
    xs = np.linspace(margin, W - margin, grid_x)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)[None].astype(np.float32)


def dense_queries(H: int, W: int, stride: int = 8) -> np.ndarray:
    """Every ``stride``-th pixel (reference ``test_on_davis.py:103-105``)."""
    return np.asarray(gridcloud2d(1, H // stride, W // stride)) * stride


class WindowTracker:
    """Jitted forward over one S-frame window."""

    def __init__(self, model: Pips, params, iters: int = 6,
                 corr_mode: str = "onehot", use_fused_corr: bool | None = None,
                 dtype=jnp.float32, mesh=None):
        if use_fused_corr is not None:  # back-compat
            corr_mode = "fused" if use_fused_corr else "full"
        self.model = model
        self.params = params
        self.iters = iters
        self.dtype = dtype
        self.mesh = mesh

        # With a mesh, every device call shards the POINT axis over all mesh
        # devices (points are independent — zero cross-point collectives;
        # the video/features replicate) and the encoder shards the FRAME
        # axis (per-frame convs, equally independent). This is the serving
        # analog of parallel.make_sharded_forward, reachable from the chain
        # engines and eval runners (VERDICT r4 #3); it replaces the
        # reference's single-process DataParallel (train.py:254).
        if mesh is not None:
            from pips_tpu.parallel.mesh import DATA_AXIS, POINT_AXIS, replicate
            from jax.sharding import NamedSharding, PartitionSpec as P
            both = (DATA_AXIS, POINT_AXIS)
            rep = replicate(mesh)
            sh_n = NamedSharding(mesh, P(None, both, None))          # (B,N,2)/(B,N,C)
            sh_sn = NamedSharding(mesh, P(None, None, both))         # (B,S,N)
            sh_sn2 = NamedSharding(mesh, P(None, None, both, None))  # (B,S,N,2)
            sh_frames = NamedSharding(mesh, P(None, both, None, None, None))
            jit_fwd = functools.partial(
                jax.jit, in_shardings=(rep, sh_n, rep),
                out_shardings=(sh_sn2, sh_sn))
            jit_encode = functools.partial(
                jax.jit, in_shardings=(rep, sh_frames), out_shardings=rep)
            jit_track = functools.partial(
                jax.jit, in_shardings=(rep, rep, sh_n, sh_n),
                out_shardings=(sh_sn2, sh_sn, sh_n))
            jit_track_nofeat = functools.partial(
                jax.jit, in_shardings=(rep, rep, sh_n),
                out_shardings=(sh_sn2, sh_sn, sh_n))
        else:
            jit_fwd = jit_encode = jit_track = jit_track_nofeat = jax.jit

        @jit_fwd
        def _fwd(params, xys, rgbs):
            out = model.apply(params, xys, rgbs, iters=iters, is_train=False,
                              corr_mode=corr_mode)
            return out.coord_predictions[-1], out.vis_e

        self._fwd = _fwd

        @jit_encode
        def _encode(params, rgbs):
            return model.apply(params, rgbs, method="encode")

        self._encode = _encode

        @jit_track
        def _track(params, fmaps, xys, feat_init):
            out = model.apply(params, fmaps, xys, feat_init=feat_init,
                              iters=iters, is_train=False,
                              corr_mode=corr_mode, method="track")
            return out.coord_predictions[-1], out.vis_e, out.ffeat

        @jit_track_nofeat
        def _track_nofeat(params, fmaps, xys):
            out = model.apply(params, fmaps, xys, iters=iters, is_train=False,
                              corr_mode=corr_mode, method="track")
            return out.coord_predictions[-1], out.vis_e, out.ffeat

        self._track = _track
        self._track_nofeat = _track_nofeat

    @property
    def _ndev(self) -> int:
        return self.mesh.devices.size if self.mesh is not None else 1

    def _pad_points(self, x, axis: int = 1):
        """Pad the point axis to a multiple of the mesh size (pjit shards
        must divide evenly); repeat the last point — results are sliced off."""
        n = x.shape[axis]
        pad = -n % self._ndev
        if not pad:
            return x, n
        reps = jnp.repeat(jnp.take(x, jnp.array([n - 1]), axis=axis), pad,
                          axis=axis)
        return jnp.concatenate([x, reps], axis=axis), n

    def __call__(self, xys: np.ndarray, rgbs: np.ndarray):
        """xys: (B, N, 2); rgbs: (B, S, H, W, 3) in [0,255].
        Returns (trajs (B, S, N, 2), vis logits (B, S, N))."""
        xys_p, n = self._pad_points(jnp.asarray(xys, self.dtype))
        trajs, vis = self._fwd(self.params, xys_p, jnp.asarray(rgbs, self.dtype))
        return np.asarray(trajs)[:, :, :n], np.asarray(vis)[:, :, :n]

    def encode(self, rgbs) -> jnp.ndarray:
        rgbs = jnp.asarray(rgbs, self.dtype)
        rgbs_p, s = self._pad_points(rgbs)  # frame axis shards like points
        return self._encode(self.params, rgbs_p)[:, :s]

    def track(self, fmaps, xys, feat_init: Optional[jnp.ndarray] = None):
        xys_p, n = self._pad_points(jnp.asarray(xys, self.dtype))
        if feat_init is None:
            coords, vis, ffeat = self._track_nofeat(self.params, fmaps, xys_p)
        else:
            feat_p, _ = self._pad_points(jnp.asarray(feat_init))
            coords, vis, ffeat = self._track(self.params, fmaps, xys_p, feat_p)
        if n == coords.shape[2]:
            return coords, vis, ffeat
        return coords[:, :, :n], vis[:, :, :n], ffeat[:, :n]
