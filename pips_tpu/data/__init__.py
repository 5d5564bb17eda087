from pips_tpu.data.loader import DevicePrefetcher, batch_iterator
from pips_tpu.data.synthetic import SyntheticPointDataset

__all__ = ["DevicePrefetcher", "SyntheticPointDataset", "batch_iterator"]
