from .config import Config, parse_cfg_options

__all__ = ["Config", "parse_cfg_options"]
