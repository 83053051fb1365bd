"""Worker for the two-process distributed rehearsal
(tests/test_distributed.py).  Run as:

    python tests/dist_worker.py <process_id> <coordinator_port> <out_file>

Each process forces the CPU platform with 4 host devices, joins the
2-process jax.distributed runtime (8 global devices), takes its strided
catalog shard, feeds REAL decoded batches through
``jax.make_array_from_process_local_data`` into one jitted sharded WS
step, and checks its addressable output rows — plus one cross-process
collective reduction — against locally-computed single-process truth.
"""
import os
import pathlib
import sys

import jax

jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=4")

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

DATA = pathlib.Path("/root/reference/data")
N_HOSTS = 2
LOCAL_BS = 4


def main(pid: int, port: int, out_file: str):
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from wsunet_tpu.data import iterate_batches, stego_spatial
    from wsunet_tpu.ops import NAMED_FILTERS_2D, ws_attack
    from wsunet_tpu.parallel.distributed import (
        distributed_init, global_batch, process_local_rows)

    active = distributed_init(
        coordinator_address=f"localhost:{port}",
        num_processes=N_HOSTS, process_id=pid)
    assert active, "expected a multi-process runtime"
    assert jax.process_count() == N_HOSTS
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    catalog = stego_spatial(DATA, stego_method="LSBR")[:16].reset_index(
        drop=True)

    # single-process truth, computed locally and unsharded
    step_local = jax.jit(lambda p: ws_attack(
        p, pixel_kernel=NAMED_FILTERS_2D["KB"]))
    want = {}
    for batch in iterate_batches(DATA, catalog, LOCAL_BS):
        vals = np.asarray(step_local(
            jax.device_put(jnp.asarray(batch.pixels),
                           jax.local_devices()[0])))
        for i, (_, row) in enumerate(batch.rows.iterrows()):
            want[row["name"]] = vals[i]

    mesh = Mesh(np.array(jax.devices()).reshape(N_HOSTS * 4), ("data",))
    step = jax.jit(
        lambda p: ws_attack(p, pixel_kernel=NAMED_FILTERS_2D["KB"]),
        out_shardings=NamedSharding(mesh, P("data")))

    shard = process_local_rows(catalog)
    assert list(shard["name"]) == list(catalog["name"][pid::N_HOSTS])

    checked = 0
    beta_sum = 0.0
    for batch in iterate_batches(DATA, shard, LOCAL_BS):
        arr = global_batch(mesh, batch.pixels)  # global [8, 512, 512]
        assert not arr.sharding.is_fully_addressable
        betas = step(arr)
        # every process owns the block of rows it fed (process order)
        local_rows = np.concatenate(
            [np.asarray(s.data) for s in sorted(
                betas.addressable_shards, key=lambda s: s.index[0].start)])
        for i, (_, row) in enumerate(batch.rows.iterrows()):
            np.testing.assert_allclose(
                local_rows[i], want[row["name"]], rtol=1e-5, atol=1e-7)
            checked += 1
        # cross-process collective: the masked global sum reduces over the
        # sharded batch axis (XLA inserts the inter-process all-reduce)
        mask_arr = global_batch(mesh, batch.mask.astype(np.float32))
        beta_sum += float(jax.jit(
            lambda b, m: jnp.sum(b * m))(betas, mask_arr))

    want_sum = float(sum(want[n] for n in catalog["name"]))
    np.testing.assert_allclose(beta_sum, want_sum, rtol=1e-5)

    pathlib.Path(out_file).write_text(f"OK {checked}\n")


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
