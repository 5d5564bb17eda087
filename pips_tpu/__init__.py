"""pips_tpu: TPU-native point-tracking framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of aharley/pips
("Particle Video Revisited", ECCV 2022): given an S-frame RGB video window and N
query points, predict per-point trajectories ``trajs_e (B, S, N, 2)`` and
visibility logits ``vis_e (B, S, N)``; long videos are handled by
visibility-aware chaining of windows.

Design notes (TPU-first, not a port):
  * channel-last (NHWC) tensors everywhere; convolutions and the corr-pyramid
    einsums map onto the MXU; iterative refinement is statically unrolled
    under ``jax.jit``.
  * points are independent by construction, so the N axis is the
    embarrassingly-parallel scaling axis: sharded over the device mesh
    alongside batch (see ``pips_tpu.parallel``).
  * the reference's per-point sequential chaining loop
    (reference ``chain_demo.py:40-83``) is redesigned as host-side scheduling
    over fixed-shape batched device calls (see ``pips_tpu.inference.chain``).
"""

from pips_tpu.version import __version__


def __getattr__(name):
    # lazy top-level API (avoids importing jax for metadata-only uses)
    if name in ("Pips", "PipsOutput"):
        from pips_tpu import models
        return getattr(models, name)
    if name in ("ChainTracker", "ChainTrackerOnDevice", "WindowTracker",
                "FlowChainTracker"):
        from pips_tpu import inference
        return getattr(inference, name)
    raise AttributeError(name)


__all__ = ["ChainTracker", "ChainTrackerOnDevice", "FlowChainTracker", "Pips",
           "PipsOutput", "WindowTracker", "__version__"]
