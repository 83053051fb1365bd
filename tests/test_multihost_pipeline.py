"""Multi-host input-pipeline rehearsal (SURVEY §5.8 / P3).

A real multi-process runtime cannot be simulated inside one pytest
process (jax.distributed needs separate processes; with process_count==1
``jax.make_array_from_process_local_data`` degenerates to device_put).
What CAN be rehearsed — and is, here — is the full multi-host feeding
contract on an 8-virtual-device mesh:

- each simulated host takes its strided catalog shard
  (``process_local_rows``),
- drives a REAL ``iterate_batches`` epoch over its rows (decode, padding,
  masks),
- the per-host local batches are assembled in process order — exactly the
  layout ``jax.make_array_from_process_local_data`` produces, where host i
  owns the i-th block of the batch axis — and placed via ``global_batch``,
- one jitted WS step runs on the assembled global batch and must equal the
  single-host full-catalog sweep row for row.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


N_HOSTS = 2


@pytest.fixture()
def catalog(data_root):
    from wsunet_tpu.data import stego_spatial
    df = stego_spatial(data_root, stego_method="LSBR")
    # 20 rows -> divisible host shards of 10
    return df[:20].reset_index(drop=True)


def test_process_local_rows_partition(catalog):
    from wsunet_tpu.parallel.distributed import process_local_rows
    shards = [process_local_rows(catalog, i, N_HOSTS) for i in range(N_HOSTS)]
    # disjoint, covering, strided
    names = sorted(n for s in shards for n in s["name"])
    assert names == sorted(catalog["name"])
    assert list(shards[0]["name"]) == list(catalog["name"][0::N_HOSTS])


def test_global_batch_epoch_matches_single_host(data_root, catalog):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from wsunet_tpu.data import iterate_batches
    from wsunet_tpu.ops import NAMED_FILTERS_2D, ws_attack
    from wsunet_tpu.parallel import get_mesh
    from wsunet_tpu.parallel.distributed import (
        global_batch, process_local_rows)

    mesh = get_mesh(8)
    step = jax.jit(lambda p: ws_attack(
        p, pixel_kernel=NAMED_FILTERS_2D["KB"]))

    # single-host ground truth over the whole catalog
    want = {}
    for batch in iterate_batches(data_root, catalog, 4):
        vals = np.asarray(step(jnp.asarray(batch.pixels)))
        for i, (_, row) in enumerate(batch.rows.iterrows()):
            want[row["name"]] = vals[i]

    # simulated 2-host epoch: each host iterates its own shard with local
    # batch size global/2; global batches assemble host blocks in order
    local_bs = 4
    host_iters = [
        iterate_batches(data_root,
                        process_local_rows(catalog, h, N_HOSTS), local_bs)
        for h in range(N_HOSTS)
    ]
    n_steps = 0
    for locals_ in zip(*host_iters):
        pixels = np.concatenate([b.pixels for b in locals_])
        arr = global_batch(mesh, pixels)
        assert arr.sharding.is_fully_addressable
        vals = np.asarray(step(arr))
        off = 0
        for b in locals_:
            for i, (_, row) in enumerate(b.rows.iterrows()):
                np.testing.assert_allclose(
                    vals[off + i], want[row["name"]], rtol=1e-5, atol=1e-7)
            off += local_bs
        n_steps += 1
    shard_len = len(catalog) // N_HOSTS
    assert n_steps == -(-shard_len // local_bs)  # padded tail included
