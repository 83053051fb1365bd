from .unet import UNet, get_model
from .b0 import EfficientNetB0, get_b0

__all__ = ["UNet", "get_model", "EfficientNetB0", "get_b0"]
