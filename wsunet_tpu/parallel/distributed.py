"""Multi-host runtime helpers.
SURVEY.md §5.8: the reference has no distributed backend at all; the TPU
equivalent needs no custom transport — ``jax.distributed`` brings up the
DCN-coordinated runtime, per-host input pipelines feed
``jax.make_array_from_process_local_data``, and all device collectives
ride ICI inside jitted programs.

On a single host these helpers are no-ops / pass-throughs, so the same
training script runs unchanged from a laptop CPU to a multi-host slice.
"""


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(**kw) -> bool:
    """Initialize jax.distributed when running under a multi-process
    launcher (env-configured); returns True if a multi-process runtime is
    active.  Safe to call on a single host (no-op)."""
    try:
        jax.distributed.initialize(**kw)
    except (ValueError, RuntimeError):
        # single-process / already initialized
        pass
    return jax.process_count() > 1


def process_local_rows(df, process_index: int = None,
                       process_count: int = None):
    """Slice a catalog frame to this host's strided shard (each host
    decodes only its own rows)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return df.iloc[pi::pc]


def global_batch(mesh: Mesh, local_pixels: np.ndarray,
                 axis: str = "data"):
    """Assemble per-host local batches into one global batch-sharded array
    (multi-host: jax.make_array_from_process_local_data; single-host:
    plain device_put)."""
    sharding = NamedSharding(
        mesh, P(axis, *([None] * (local_pixels.ndim - 1))))
    if jax.process_count() == 1:
        return jax.device_put(local_pixels, sharding)
    return jax.make_array_from_process_local_data(sharding, local_pixels)
