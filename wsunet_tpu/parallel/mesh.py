"""Device mesh and sharding helpers.
The reference has no distributed runtime at all (SURVEY.md §2 P1-P3: joblib
process pools only).  Here every batched program is mesh-aware from day 1:
a 1-D ``data`` mesh shards the batch dimension, parameters are replicated,
and XLA inserts the ICI collectives (psum for metric/gradient reductions)
when a jitted step is given these shardings.  The same code runs on 1 chip,
a v5e slice, or a host-device-count-forced CPU for CI.
"""


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_count() -> int:
    return len(jax.devices())


def get_mesh(n_devices: int = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place array(s) with the leading (batch) dim sharded over the mesh.

    Batch sizes must be divisible by the mesh size (the input pipeline pads
    batches to a fixed size, so pick batch_size as a multiple of devices).
    """

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (e.g. params) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
