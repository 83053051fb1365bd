from .mesh import get_mesh, shard_batch, replicate, device_count
from .eval_shard import (
    allgather_rows, batch_sharding, cache_on_device, eval_device_count,
    fetch_rows, host_shard, jit_sharded, place, round_batch,
    set_eval_devices)

__all__ = ["get_mesh", "shard_batch", "replicate", "device_count",
           "allgather_rows", "batch_sharding", "cache_on_device",
           "eval_device_count", "fetch_rows", "host_shard", "jit_sharded",
           "place", "round_batch", "set_eval_devices"]
