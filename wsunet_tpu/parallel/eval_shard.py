"""Mesh-sharded evaluation sweeps (VERDICT r4 item 1).

The reference parallelizes its sweeps with a joblib process pool over
images (src/fabrika.py:92-100, src/ws/estimate.py:139-146).  The TPU
substitute is batch data-parallelism: every jitted eval step is compiled
with its batch dimension sharded over a 1-D device mesh, so the same
``ws-eval``/``unet-eval``/``detector-eval``/``roc`` CLI run uses one
chip, every chip of a v5e slice, or the 8-virtual-device CPU mesh of the
test suite — with bit-identical per-image results (the sweeps' math is
per-image: sharding the batch axis changes no reduction order inside an
image).

Two pieces:

- ``jit_sharded(step)``: jit with ``in_shardings/out_shardings`` pinned
  to ``P("data")`` over all visible devices, letting XLA partition the
  program (GSPMD); on a 1-device mesh it is plain ``jax.jit``, keeping
  the single-chip compile path byte-identical to round 4.
- ``place(batch)``: device_put with the same sharding, used by the
  sweeps (and the device-resident batch cache) so host batches land
  already distributed instead of bouncing through device 0.

Multi-host (``jax.process_count() > 1``): each host feeds its own row
shard and the pooled frame is reassembled with
``parallel.distributed.process_local_rows`` + a host all-gather — see
``ws/estimate.py`` — so the sweeps ride DCN only for the final scalar
scores, never for pixels.

The batch axis must divide by the device count: ``round_batch(b)``
rounds a requested batch size up to the next multiple (the input
pipeline pads every batch to the full batch size, so this only changes
padding, never results).
"""

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import get_mesh

# test hook: force the eval mesh to the first N devices (lets one
# process compare the 1-device and 8-device paths row-for-row)
_FORCE_DEVICES = None


def set_eval_devices(n):
    """Limit eval sweeps to the first ``n`` visible devices (None = all).
    Testing hook; also useful to pin a sweep to one chip of a shared
    slice."""
    global _FORCE_DEVICES
    _FORCE_DEVICES = n


def eval_mesh():
    return get_mesh(_FORCE_DEVICES)


def eval_device_count() -> int:
    return int(eval_mesh().devices.size)


def round_batch(batch_size: int) -> int:
    """Round up to a multiple of the eval mesh size (batches are padded
    to a fixed size anyway, so this never drops or duplicates rows)."""
    n = eval_device_count()
    return -(-batch_size // n) * n


def batch_sharding():
    """NamedSharding splitting the leading (batch) axis over the eval
    mesh; trailing axes replicated regardless of rank."""
    return NamedSharding(eval_mesh(), P("data"))


def place(pixels):
    """Host batch -> batch-sharded device array (no-op passthrough for
    arrays already on device, e.g. the device-resident batch cache).

    Under a multi-process runtime the host batch is this host's SHARD of
    the global batch (host_shard feeds each host its strided rows): it is
    assembled into one global array via
    jax.make_array_from_process_local_data, so pixels never cross DCN."""
    if isinstance(pixels, jax.Array) and not isinstance(pixels, np.ndarray):
        return pixels
    if jax.process_count() > 1:
        from .distributed import global_batch
        return global_batch(eval_mesh(), np.asarray(pixels))
    return jax.device_put(np.asarray(pixels), batch_sharding())


def host_shard(df):
    """(local_rows, n_true): this host's strided shard of a catalog frame,
    padded (by repeating the first row) so EVERY host holds the same row
    count — each jitted sweep step is a global collective program under
    multi-process, so all hosts must execute the same number of steps.
    ``n_true`` is the unpadded shard length; values computed for pad rows
    are dropped before allgather_rows.  Single-process: (df, len(df))."""
    pc = jax.process_count()
    if pc == 1:
        return df, len(df)
    from .distributed import process_local_rows
    local = process_local_rows(df)
    n_true = len(local)
    target = -(-len(df) // pc)
    if n_true < target and len(df):
        import pandas as pd
        local = pd.concat([local] + [df.iloc[[0]]] * (target - n_true))
    return local, n_true


def fetch_rows(out) -> np.ndarray:
    """Per-image outputs of a sharded step -> THIS host's rows as numpy.
    Single-process: the whole vector.  Multi-process: the addressable
    block this host fed (process-ordered shards, matching host_shard's
    row order)."""
    if jax.process_count() == 1:
        return np.asarray(out)
    shards = sorted(out.addressable_shards,
                    key=lambda s: (s.index[0].start or 0))
    return np.concatenate([np.asarray(s.data) for s in shards])


def cache_on_device() -> bool:
    """Device-resident batch caching is a single-process optimization:
    under multi-process the cached local placement cannot feed the global
    assembly, so the sweeps disable it."""
    return jax.process_count() == 1


def jit_sharded(step, via_shard_map: bool = False):
    """Compile ``step`` (pixels -> per-image outputs, leading axis =
    batch) with batch-sharded inputs and outputs.  1-device mesh -> plain
    jax.jit (identical to the unsharded round-4 compile).

    ``via_shard_map=True`` partitions by running ``step`` per device on
    its local batch shard instead of letting GSPMD slice the program —
    required for steps XLA cannot auto-partition, i.e. the fused Pallas
    WS kernel (a pallas_call has no partitioning rule; each device runs
    its own kernel instance on its shard).  Only valid for steps that
    are pure per-image maps, which every eval sweep step is."""
    if eval_device_count() == 1:
        return jax.jit(step)
    s = batch_sharding()
    if via_shard_map:
        try:
            from jax import shard_map
        except ImportError:  # pre-0.8 fallback
            from jax.experimental.shard_map import shard_map
        inner = shard_map(step, mesh=eval_mesh(), in_specs=P("data"),
                          out_specs=P("data"), check_vma=False)
        return jax.jit(inner)
    return jax.jit(step, in_shardings=s, out_shardings=s)


def allgather_rows(values: np.ndarray, n_total: int) -> np.ndarray:
    """Multi-host sweep reassembly: each host computed ``values`` for its
    strided row shard (rows ``process_index::process_count`` of a
    length-``n_total`` catalog, parallel.distributed.process_local_rows);
    return the full, original-order vector on every host.  Single-process
    passthrough.  Scores/betas ride DCN as float64 (x64 enabled for the
    gather) so multi-host sweeps stay bit-identical to single-host."""
    pc = jax.process_count()
    if pc == 1:
        return values
    from jax.experimental import multihost_utils
    values = np.asarray(values)
    pad = -(-n_total // pc)
    buf = np.full((pad,), np.nan, values.dtype)
    buf[: len(values)] = values
    with jax.enable_x64(True):
        gathered = np.asarray(multihost_utils.process_allgather(buf))
    out = np.full((n_total,), np.nan, values.dtype)
    for p in range(pc):
        rows = np.arange(p, n_total, pc)
        out[rows] = gathered[p][: len(rows)]
    return out
