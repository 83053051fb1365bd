from .filters import (
    NAMED_FILTERS,
    NAMED_FILTERS_2D,
    get_coefficients,
    conv2d_valid,
    filter_predict,
    filter_residuals,
)
from .ws import (ws_attack, ws_attack_sca, ws_estimate_unet,
                 ws_estimate_inloss)
from .hill import hill_cost

__all__ = [
    "NAMED_FILTERS",
    "NAMED_FILTERS_2D",
    "get_coefficients",
    "conv2d_valid",
    "filter_predict",
    "filter_residuals",
    "ws_attack",
    "ws_attack_sca",
    "ws_estimate_unet",
    "ws_estimate_inloss",
    "hill_cost",
]
