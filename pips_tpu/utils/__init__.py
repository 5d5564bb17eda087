from pips_tpu.utils.pools import SimplePool
from pips_tpu.utils import saverloader

__all__ = ["SimplePool", "saverloader"]
