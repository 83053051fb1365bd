#!/usr/bin/env python
"""Repo-root benchmark entry point (driver contract: prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"}).  See wsunet_tpu/bench.py."""

import json
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from wsunet_tpu.bench import run_bench


def main():
    out = run_bench()
    keys = ["metric", "value", "unit", "vs_baseline", "mfu",
            "flops_per_image", "tflops_per_sec", "fast_conv",
            "fast_conv_error", "ws_fused", "e2e_decode",
            "latency_ms_b1", "rtt_floor_ms", "latency_ms_b1_net",
            "latency_error", "platform", "tpu_unreachable"]
    print(json.dumps({k: out[k] for k in keys if k in out}))


if __name__ == "__main__":
    main()
