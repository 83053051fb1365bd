from .estimate import run as ws_run, attack_sweep
from .filters_eval import run as filters_run
from .unet_eval import (
    infer_unet,
    get_unet_estimator,
    load_pretrained_unet,
    run as unet_run,
)

__all__ = [
    "ws_run",
    "attack_sweep",
    "filters_run",
    "infer_unet",
    "get_unet_estimator",
    "load_pretrained_unet",
    "unet_run",
]
