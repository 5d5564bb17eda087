"""Fully on-device visibility-aware chaining: ONE jitted call per video.

The host-scheduled ``ChainTracker`` issues one device call per distinct
window start — throughput-optimal (each call computes only the points at
that start), but dispatch-bound for latency-critical serving. This variant
moves the entire loop into a single ``lax.while_loop``:

  * state: per-point window start ``cur``, trajectory/visibility buffers,
    done flags; features are pre-sampled once (identical to the reference's
    first-window init) and carried;
  * each iteration picks the EARLIEST pending start t = min(cur | !done),
    gathers the shared S-frame feature window (last-frame padding via index
    clipping), refines ALL N points at that window, and commits results only
    for points whose ``cur == t`` (masked scatter);
  * the skip rule runs in-graph (vectorized closed form of the reference's
    threshold-decay scan, same as ``chain.select_skip``);
  * iteration count = number of distinct visited starts (exactly like the
    host scheduler), but with zero host round-trips.

Trade-off vs the host scheduler: every visited start pays full-N compute
instead of bucket-sized compute, in exchange for removing per-window
dispatch latency entirely. Pick per deployment; both produce the same
trajectories (see tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pips_tpu.models import Pips
from pips_tpu.ops.samp import bilinear_sample2d


def select_skip_jnp(vis_prob: jnp.ndarray, S: int, thr_init: float = 0.9,
                    thr_decay: float = 0.02, si_earliest: int = 1) -> jnp.ndarray:
    """In-graph version of ``chain.select_skip``. vis_prob: (N, S) -> (N,) int32."""
    cand = vis_prob[:, si_earliest + 1:]
    vmax = jnp.max(cand, axis=1)
    k = jnp.maximum(jnp.ceil((thr_init - vmax) / thr_decay + 1e-9), 0.0)
    thr = thr_init - k * thr_decay
    thr = jnp.where(thr >= vmax, thr - thr_decay, thr)
    si = jnp.arange(si_earliest + 1, S)
    accept = cand > thr[:, None]
    return jnp.max(jnp.where(accept, si[None], -1), axis=1).astype(jnp.int32)


class ChainTrackerOnDevice:
    """Track N points through a T-frame video in one device call."""

    def __init__(self, model: Pips, params, iters: int = 6,
                 corr_mode: str = "onehot", max_starts: Optional[int] = None,
                 fixed_skip: Optional[int] = None):
        self.model = model
        self.params = params
        self.iters = iters
        self.corr_mode = corr_mode
        self.max_starts = max_starts
        self.fixed_skip = fixed_skip  # testing hook: bypass the vis rule

        @jax.jit
        def _encode(params, rgbs):  # (1, S, H, W, 3) chunks
            return model.apply(params, rgbs, method="encode")

        self._encode = _encode

        @functools.partial(jax.jit, static_argnames=("T",))
        def _chain(params, fmaps, xys, T):
            """fmaps: (T, H8, W8, C); xys: (N, 2). One while_loop per video."""
            S = model.S
            N = xys.shape[0]
            stride = float(model.stride)

            feat = bilinear_sample2d(fmaps[None, 0], xys[None, :, 0] / stride,
                                     xys[None, :, 1] / stride)[0]  # (N, C)

            # buffers padded by S frames so window writes never clip
            trajs = jnp.zeros((T + S, N, 2), jnp.float32)
            trajs = trajs.at[0].set(xys)
            vis = jnp.zeros((T + S, N), jnp.float32)
            cur = jnp.zeros((N,), jnp.int32)
            done = jnp.zeros((N,), bool)

            def cond(state):
                it, cur, done, trajs, vis = state
                bound = self.max_starts if self.max_starts else T
                return (~jnp.all(done)) & (it < bound)

            def body(state):
                it, cur, done, trajs, vis = state
                t = jnp.min(jnp.where(done, T, cur))

                frame_idx = jnp.clip(t + jnp.arange(S), 0, T - 1)
                fm_win = jnp.take(fmaps, frame_idx, axis=0)[None]  # (1,S,...)

                q = jnp.take_along_axis(
                    trajs, jnp.broadcast_to(cur[None, :, None],
                                            (1, N, 2)).astype(jnp.int32),
                    axis=0)[0]  # (N, 2): each point's estimate at ITS start

                out = model.apply(params, fm_win, q[None], feat_init=feat[None],
                                  iters=self.iters, is_train=False,
                                  corr_mode=self.corr_mode, method="track")
                coords = out.coord_predictions[-1][0]  # (S, N, 2)
                vis_p = jax.nn.sigmoid(out.vis_e[0])   # (S, N)

                active = (cur == t) & (~done)
                # masked window commit at rows t..t+S-1
                old_t = jax.lax.dynamic_slice(trajs, (t, 0, 0), (S, N, 2))
                new_t = jnp.where(active[None, :, None], coords, old_t)
                trajs = jax.lax.dynamic_update_slice(trajs, new_t, (t, 0, 0))
                old_v = jax.lax.dynamic_slice(vis, (t, 0), (S, N))
                new_v = jnp.where(active[None, :], vis_p, old_v)
                vis = jax.lax.dynamic_update_slice(vis, new_v, (t, 0))

                if self.fixed_skip is not None:
                    skips = jnp.full((N,), self.fixed_skip, jnp.int32)
                else:
                    skips = select_skip_jnp(vis_p.T, S)  # (N,)
                nxt = t + skips
                cur = jnp.where(active, nxt, cur)
                done = done | (active & (nxt >= T))
                return it + 1, cur, done, trajs, vis

            _, cur, done, trajs, vis = jax.lax.while_loop(
                cond, body, (jnp.int32(0), cur, done, trajs, vis))
            return trajs[:T], vis[:T]

        self._chain = _chain

    def encode_video(self, rgbs, chunk: int = 8) -> jnp.ndarray:
        """rgbs: (T, H, W, 3) array or a ``FrameFeed`` (double-buffered host
        decode overlapping the device encode; see inference/feed.py)."""
        from pips_tpu.inference.feed import as_feed

        parts = [self._encode(self.params, jnp.asarray(c)[None])[0][:n]
                 for c, n in as_feed(rgbs, chunk)]
        return jnp.concatenate(parts, 0)

    def track_video(self, rgbs, xys: np.ndarray):
        """rgbs: (T, H, W, 3) [0,255] or a ``FrameFeed``; xys: (N, 2)
        -> (trajs (T,N,2), vis (T,N))."""
        fmaps = self.encode_video(rgbs)
        trajs, vis = self._chain(self.params, fmaps,
                                 jnp.asarray(xys, jnp.float32),
                                 int(fmaps.shape[0]))
        return np.asarray(trajs), np.asarray(vis)
