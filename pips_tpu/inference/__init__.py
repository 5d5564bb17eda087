from pips_tpu.inference.chain import ChainTracker, select_skip
from pips_tpu.inference.window import WindowTracker

__all__ = ["ChainTracker", "WindowTracker", "select_skip"]
