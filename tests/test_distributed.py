"""TRUE multi-process distributed rehearsal (SURVEY §5.8 / P3).

Unlike tests/test_multihost_pipeline.py (which simulates hosts inside one
process), this spawns TWO real processes that each initialize
``jax.distributed`` (CPU platform, 4 forced host devices each -> 8 global
devices, Gloo cross-process collectives), drive ``process_local_rows`` +
``jax.make_array_from_process_local_data`` through real decoded WS steps,
and verify both the per-row results and a cross-process collective
reduction against single-process truth.  See tests/dist_worker.py for the
per-process body.
"""
import pathlib
import socket
import subprocess
import sys

WORKER = pathlib.Path(__file__).resolve().parent / "dist_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_ws(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"p{i}.txt" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), str(port), str(outs[i])],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-3000:]}"
    # both workers checked their full strided shard (16 rows total)
    checked = [int(o.read_text().split()[1]) for o in outs]
    assert sum(checked) == 16 and min(checked) == 8


SWEEP_WORKER = pathlib.Path(__file__).resolve().parent / \
    "dist_sweep_worker.py"


def test_two_process_ws_run(tmp_path):
    """VERDICT r4 item 1 multi-host leg: the REAL sweep entry point
    (ws.estimate.run) under a 2-process runtime returns, on EVERY host,
    the same full catalog-ordered frame a single-process run produces."""
    import pandas as pd
    from wsunet_tpu.ws.estimate import run

    want = pd.concat([
        run("/root/reference/data", "LSBR", 0.1, "KB", batch_size=4),
        run("/root/reference/data", None, None, "KB", batch_size=4),
    ]).reset_index(drop=True)

    port = _free_port()
    outs = [tmp_path / f"sweep{i}.csv" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(SWEEP_WORKER), str(i), str(port),
             str(outs[i])],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"sweep worker {i} failed:\n{logs[i][-3000:]}"
    for o in outs:
        got = pd.read_csv(o)
        assert list(got["name"]) == list(want["name"])
        import numpy as np
        np.testing.assert_allclose(
            got["beta_hat"].to_numpy(), want["beta_hat"].to_numpy(),
            rtol=1e-6, atol=1e-9)
