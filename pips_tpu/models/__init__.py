from pips_tpu.models.encoder import BasicEncoder
from pips_tpu.models.mixer import DeltaBlock, MLPMixer
from pips_tpu.models.pips import Pips, PipsOutput
from pips_tpu.models.pips2 import Pips2

__all__ = ["BasicEncoder", "DeltaBlock", "MLPMixer", "Pips", "Pips2",
           "PipsOutput"]
