"""Optical-flow chaining tracker (the RAFT baseline's tracking mode).

Capability parity with reference ``test_on_flt.py:144-161`` /
``test_on_badja.py:199-217``: compute consecutive-frame flow fields, then
integrate each query point through them with border-replicating bilinear
sampling at the current position.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from pips_tpu.ops.samp import bilinear_sample2d


def chain_flows(flows: jnp.ndarray, xy0: jnp.ndarray) -> jnp.ndarray:
    """flows: (B, S-1, H, W, 2); xy0: (B, N, 2). Returns trajs (B, S, N, 2)."""
    Sm1 = flows.shape[1]
    coords = [xy0]
    coord = xy0
    for s in range(Sm1):
        delta = bilinear_sample2d(flows[:, s], coord[:, :, 0], coord[:, :, 1])
        coord = coord + delta
        coords.append(coord)
    return jnp.stack(coords, axis=1)


class FlowChainTracker:
    """Track points by integrating per-frame flow (RAFT or any flow fn)."""

    def __init__(self, flow_fn: Callable[[np.ndarray, np.ndarray], np.ndarray]):
        """flow_fn: (rgb0, rgb1) each (B, H, W, 3) in [-0.5, 0.5]
        -> flow (B, H, W, 2)."""
        self.flow_fn = flow_fn

    def track(self, rgbs: np.ndarray, xy0: np.ndarray) -> np.ndarray:
        """rgbs: (B, S, H, W, 3) in [0, 255]; xy0: (B, N, 2) -> (B, S, N, 2)."""
        B, S, H, W, _ = rgbs.shape
        prep = rgbs / 255.0 - 0.5
        flows = np.stack(
            [np.asarray(self.flow_fn(prep[:, s], prep[:, s + 1]))
             for s in range(S - 1)], axis=1)
        return np.asarray(chain_flows(jnp.asarray(flows), jnp.asarray(xy0)))
