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
                 dtype=jnp.float32):
        if use_fused_corr is not None:  # back-compat
            corr_mode = "fused" if use_fused_corr else "full"
        self.model = model
        self.params = params
        self.iters = iters
        self.dtype = dtype

        @functools.partial(jax.jit, static_argnames=())
        def _fwd(params, xys, rgbs):
            out = model.apply(params, xys, rgbs, iters=iters, is_train=False,
                              corr_mode=corr_mode)
            return out.coord_predictions[-1], out.vis_e

        self._fwd = _fwd

        @jax.jit
        def _encode(params, rgbs):
            return model.apply(params, rgbs, method="encode")

        self._encode = _encode

        @jax.jit
        def _track(params, fmaps, xys, feat_init):
            out = model.apply(params, fmaps, xys, feat_init=feat_init,
                              iters=iters, is_train=False,
                              corr_mode=corr_mode, method="track")
            return out.coord_predictions[-1], out.vis_e, out.ffeat

        @jax.jit
        def _track_nofeat(params, fmaps, xys):
            out = model.apply(params, fmaps, xys, iters=iters, is_train=False,
                              corr_mode=corr_mode, method="track")
            return out.coord_predictions[-1], out.vis_e, out.ffeat

        self._track = _track
        self._track_nofeat = _track_nofeat

    def __call__(self, xys: np.ndarray, rgbs: np.ndarray):
        """xys: (B, N, 2); rgbs: (B, S, H, W, 3) in [0,255].
        Returns (trajs (B, S, N, 2), vis logits (B, S, N))."""
        trajs, vis = self._fwd(self.params, jnp.asarray(xys, self.dtype),
                               jnp.asarray(rgbs, self.dtype))
        return np.asarray(trajs), np.asarray(vis)

    def encode(self, rgbs) -> jnp.ndarray:
        return self._encode(self.params, jnp.asarray(rgbs, self.dtype))

    def track(self, fmaps, xys, feat_init: Optional[jnp.ndarray] = None):
        if feat_init is None:
            return self._track_nofeat(self.params, fmaps, jnp.asarray(xys, self.dtype))
        return self._track(self.params, fmaps, jnp.asarray(xys, self.dtype), feat_init)
