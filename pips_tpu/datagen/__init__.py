"""Offline FlyingThings -> FlyingThings++ dataset generation
(capability parity: reference ``make_trajs.py``, ``filter_trajs.py``,
``make_occlusions.py``). Host-side numpy tools."""

from pips_tpu.datagen.trajs import chain_flow_trajs, filter_trajs
from pips_tpu.datagen.occluders import consider_id, flood_fill_hull

__all__ = ["chain_flow_trajs", "consider_id", "filter_trajs", "flood_fill_hull"]
