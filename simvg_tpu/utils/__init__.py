from .logger import get_root_logger
from .checkpoint import save_checkpoint, load_checkpoint

__all__ = ["get_root_logger", "save_checkpoint", "load_checkpoint"]
