from .losses import l1_loss, l2_loss, ws_loss, l1ws_loss, get_loss
from .checkpoint import save_checkpoint, load_checkpoint, save_config, load_config

__all__ = [
    "l1_loss",
    "l2_loss",
    "ws_loss",
    "l1ws_loss",
    "get_loss",
    "save_checkpoint",
    "load_checkpoint",
    "save_config",
    "load_config",
]
