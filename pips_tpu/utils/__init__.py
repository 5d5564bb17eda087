from pips_tpu.utils.pools import SimplePool
from pips_tpu.utils import saverloader

__all__ = ["SimplePool", "saverloader"]

from pips_tpu.utils.format import print_stats, strnum  # noqa: E402,F401
