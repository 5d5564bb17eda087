"""ctypes bindings for the native host data-plane library (``native/``).

Every entry point has a numpy fallback, so the framework works without the
compiled library; ``ensure_built()`` compiles it on demand when a toolchain
is present.
"""

from pips_tpu.native.lib import (available, chain_step, composite, decode_pfm,
                                 ensure_built, mark_covered_frame,
                                 resize_bilinear, visibility_frame)

__all__ = ["available", "chain_step", "composite", "decode_pfm", "ensure_built",
           "mark_covered_frame", "resize_bilinear", "visibility_frame"]
