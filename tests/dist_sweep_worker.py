"""Worker for the two-process REAL-ENTRY-POINT sweep test
(tests/test_distributed.py::test_two_process_ws_run).  Run as:

    python tests/dist_sweep_worker.py <pid> <port> <out_csv>

Each process forces CPU with 4 host devices, joins the 2-process
jax.distributed runtime (8 global devices), then calls the REAL library
sweep ``wsunet_tpu.ws.estimate.run`` — which under multi-process decodes
only this host's strided row shard (parallel.host_shard), feeds global
batches via jax.make_array_from_process_local_data, and all-gathers the
per-image betas back into catalog order — and writes the full frame to
``out_csv``.  The parent test compares both workers' frames to a
single-process run of the same sweep.
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


def main(pid: int, port: int, out_csv: str):
    from wsunet_tpu.parallel.distributed import distributed_init

    active = distributed_init(
        coordinator_address=f"localhost:{port}",
        num_processes=2, process_id=pid)
    assert active and jax.process_count() == 2
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    from wsunet_tpu.ws.estimate import run
    frames = [run(DATA, "LSBR", 0.1, "KB", batch_size=4),
              run(DATA, None, None, "KB", batch_size=4)]
    import pandas as pd
    pd.concat(frames).reset_index(drop=True).to_csv(out_csv, index=False)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
