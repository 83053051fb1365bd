from .roc import produce_roc
from .ci import bootstrap_auc_pe, bootstrap_roc_cis
from .b0_eval import infer_b0, get_b0_detector, load_pretrained_b0, run as b0_run
from .holdout import Fold, holdout_frames, holdout_roc
from . import metrics

__all__ = [
    "produce_roc",
    "bootstrap_auc_pe",
    "bootstrap_roc_cis",
    "Fold",
    "holdout_frames",
    "holdout_roc",
    "infer_b0",
    "get_b0_detector",
    "load_pretrained_b0",
    "b0_run",
    "metrics",
]
