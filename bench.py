#!/usr/bin/env python
"""Repo-root benchmark entry point (driver contract: prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"}).  See wsunet_tpu/bench.py."""

import json
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from wsunet_tpu.bench import run_bench


def _last_tpu_headline():
    """Most recent committed TPU measurement, for context when the axon
    relay is down and the bench can only degrade to CPU: the outage says
    nothing about the framework, so the JSON carries the last real
    number, clearly labeled by source."""
    here = pathlib.Path(__file__).resolve().parent
    candidates = [here / "BENCH_r4_postchain.json",
                  here / "BENCH_r03.json"]
    for p in candidates:
        try:
            rec = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        rec = rec.get("parsed", rec)  # BENCH_r0N.json wraps the line
        if "value" in rec and not rec.get("tpu_unreachable"):
            return {"value": rec["value"], "unit": rec.get("unit"),
                    "vs_baseline": rec.get("vs_baseline"),
                    "source": p.name}
    return None


def main():
    out = run_bench()
    keys = ["metric", "value", "unit", "vs_baseline", "mfu",
            "flops_per_image", "tflops_per_sec", "fast_conv",
            "fast_conv_error", "ws_fused", "e2e_decode", "decode_only",
            "latency_ms_b1", "rtt_floor_ms", "latency_ms_b1_net",
            "latency_error", "platform", "tpu_unreachable"]
    rec = {k: out[k] for k in keys if k in out}
    if rec.get("tpu_unreachable"):
        last = _last_tpu_headline()
        if last is not None:
            rec["last_tpu_measurement"] = last
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
