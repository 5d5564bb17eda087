from pips_tpu.models.encoder import BasicEncoder
from pips_tpu.models.mixer import DeltaBlock, MLPMixer
from pips_tpu.models.pips import Pips, PipsOutput

__all__ = ["BasicEncoder", "DeltaBlock", "MLPMixer", "Pips", "PipsOutput"]
