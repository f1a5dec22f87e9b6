from .detr_transformer import DetrDecoder, DetrEncoder
from .tgqs_head import TGQSKDDETRHead, TGQSHeadConfig

__all__ = ["DetrDecoder", "DetrEncoder", "TGQSKDDETRHead", "TGQSHeadConfig"]
