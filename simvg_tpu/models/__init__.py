from .beit3 import BEiT3Config, BEiT3Encoder
from .model import SimVGModel, SimVGConfig

__all__ = ["BEiT3Config", "BEiT3Encoder", "SimVGModel", "SimVGConfig"]
