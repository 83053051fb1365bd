from .catalog import (
    collect_files,
    precovers,
    covers,
    stego_spatial,
    cover_stego_pairs,
    order_rows,
    resolve_path,
)
from .pipeline import load_images, iterate_batches, Batch

__all__ = [
    "collect_files",
    "precovers",
    "covers",
    "stego_spatial",
    "cover_stego_pairs",
    "order_rows",
    "resolve_path",
    "load_images",
    "iterate_batches",
    "Batch",
]
