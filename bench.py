#!/usr/bin/env python
"""Repo-root benchmark entry point (driver contract: prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"}).  See wsunet_tpu/bench.py."""

import json
import os
import sys
import threading
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

# The axon relay can wedge mid-run (port open, compute dead — observed
# twice on 2026-08-19): the start-of-run reachability probe passes and a
# later dispatch blocks forever, which would leave the driver with no
# JSON line at all.  Bound the whole bench; on timeout print the outage
# marker + the last committed TPU measurement and exit.
BENCH_TIMEOUT_S = int(os.environ.get("WSUNET_BENCH_TIMEOUT_S", "1500"))


def _last_tpu_headline():
    """Most recent committed TPU measurement, for context when the axon
    relay is down and the bench can only degrade to CPU: the outage says
    nothing about the framework, so the JSON carries the last real
    number, clearly labeled by source."""
    here = pathlib.Path(__file__).resolve().parent
    candidates = [here / "BENCH_r5_postchain.json",
                  here / "BENCH_r4_postchain.json",
                  here / "BENCH_r03.json"]
    for p in candidates:
        try:
            rec = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        rec = rec.get("parsed", rec)  # BENCH_r0N.json wraps the line
        if "value" in rec and not rec.get("tpu_unreachable") \
                and not rec.get("bench_wedged"):
            return {"value": rec["value"], "unit": rec.get("unit"),
                    "vs_baseline": rec.get("vs_baseline"),
                    "source": p.name}
    return None


KEYS = ["metric", "value", "unit", "vs_baseline", "mfu",
        "floor_value", "floor_mfu", "floor_ok",
        "flops_per_image", "tflops_per_sec", "fast_conv",
        "fast_conv_error", "ws_fused", "e2e_decode", "decode_only",
        "latency_ms_b1", "rtt_floor_ms", "latency_ms_b1_net",
        "serial_images_per_sec", "streamed_images_per_sec",
        "latency_error", "platform", "tpu_unreachable"]


def main():
    from wsunet_tpu.bench import run_bench

    done = threading.Event()
    result = {}

    def work():
        try:
            result["out"] = run_bench()
        except BaseException as e:  # surface, don't swallow
            result["error"] = f"{type(e).__name__}: {e}"
        finally:
            done.set()

    t = threading.Thread(target=work, daemon=True)
    t.start()
    if not done.wait(BENCH_TIMEOUT_S):
        rec = {"metric": "images/sec/chip UNet+WS inference",
               "value": 0.0, "unit": "images/sec/chip", "vs_baseline": 0.0,
               "bench_wedged": True,
               "note": f"axon relay wedged mid-bench (> {BENCH_TIMEOUT_S}s); "
                       "outage marker, not a measurement"}
        last = _last_tpu_headline()
        if last is not None:
            rec["last_tpu_measurement"] = last
        print(json.dumps(rec), flush=True)
        os._exit(0)
    if "error" in result:
        print(json.dumps({"metric": "images/sec/chip UNet+WS inference",
                          "value": 0.0, "unit": "images/sec/chip",
                          "vs_baseline": 0.0, "bench_error": result["error"]}),
              flush=True)
        return
    out = result["out"]
    rec = {k: out[k] for k in KEYS if k in out}
    if rec.get("tpu_unreachable"):
        last = _last_tpu_headline()
        if last is not None:
            rec["last_tpu_measurement"] = last
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
