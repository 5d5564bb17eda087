"""ctypes bindings for the native host data-plane library (``native/``).

Every entry point has a numpy fallback, so the framework works without the
compiled library; ``ensure_built()`` compiles it on demand when a toolchain
is present.
"""

from pips_tpu.native.lib import (available, chain_step, composite, decode_pfm,
                                 ensure_built, resize_bilinear)

__all__ = ["available", "chain_step", "composite", "decode_pfm", "ensure_built",
           "resize_bilinear"]
