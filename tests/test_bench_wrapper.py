"""Repo-root bench.py driver contract: the single JSON line must carry
the floor guards (VERDICT r4 item 6) and the serve streaming rates
(item 9), and a mid-run relay wedge must yield an outage-marker line
instead of hanging the driver (2026-08-19 outages)."""
import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_keys_carry_floor_guards_and_streaming_rates():
    import importlib.util
    spec = importlib.util.spec_from_file_location("rootbench",
                                                  REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for k in ("floor_value", "floor_mfu", "floor_ok",
              "serial_images_per_sec", "streamed_images_per_sec",
              "latency_ms_b1", "ws_fused", "decode_only", "mfu"):
        assert k in mod.KEYS, k


def test_wedged_bench_prints_outage_marker_line():
    p = subprocess.run(
        [sys.executable, str(REPO / "bench.py")], capture_output=True,
        text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin", "WSUNET_BENCH_TIMEOUT_S": "1",
             "HOME": "/root"})
    line = p.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["bench_wedged"] is True
    assert rec["value"] == 0.0
    assert "metric" in rec and "vs_baseline" in rec
