from .beit3 import BEiT3Config, BEiT3Encoder
from .model import SimVGModel, SimVGConfig
from .builder import build_model

__all__ = [
    "BEiT3Config",
    "BEiT3Encoder",
    "SimVGModel",
    "SimVGConfig",
    "build_model",
]
