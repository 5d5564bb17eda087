from pips_tpu.inference.chain import ChainTracker, select_skip
from pips_tpu.inference.chain_device import ChainTrackerOnDevice
from pips_tpu.inference.feed import FrameFeed
from pips_tpu.inference.flow_chain import FlowChainTracker
from pips_tpu.inference.window import WindowTracker

__all__ = ["ChainTracker", "ChainTrackerOnDevice", "FlowChainTracker",
           "FrameFeed", "WindowTracker", "select_skip"]
