from .errors import UserError
from .logging import setup_logger
from .seeding import filename_to_image_seed, seed_everything
from .run_names import create_run_name
from .aggregates import quantile, iqr_interval

__all__ = [
    "UserError",
    "setup_logger",
    "filename_to_image_seed",
    "seed_everything",
    "create_run_name",
    "quantile",
    "iqr_interval",
]
