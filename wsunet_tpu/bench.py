"""UNet+WS inference throughput benchmark.

The headline metric (BASELINE.json): images/sec/chip for the flagship
pipeline — 512x512 uint8 luminance batch -> /255 -> unet_2 cover-pixel
predictor -> fused WS change-rate estimate -> beta_hat per image — against
the measured CPU reference throughput (scripts/measure_cpu_baseline.py,
stored in BASELINE_cpu.json; the reference itself publishes no numbers).

The timed region is the steady-state device pipeline on synthetic data
(uint8 batch resident in HBM, one scalar per image back), i.e. the same
boundary the reference times implicitly: its per-image python loop also
excludes PNG decode when images are cached.

Also reported:
- ``mfu``: model-FLOPs utilization — XLA's own cost analysis of the
  compiled step (flops per execution) divided by the device's peak;
  regressions in compute efficiency are visible even when img/s moves
  with batch size.
- ``ws_fused``: on-TPU throughput AND numerics of the fused Pallas WS
  kernel vs the XLA path (the kernel auto-dispatches on TPU, so its
  parity is asserted on the hardware that actually runs it).
"""

import json
import pathlib
import time

import numpy as np

_DEFAULT_CPU_BASELINE = 0.2957535109920724  # images/sec, BASELINE_cpu.json

# peak dense-matmul throughput per chip, bf16 (f32 on MXU lowers to bf16
# passes on these parts); conservative public numbers
_PEAK_FLOPS = {
    "v5 lite": 197e12, "v5e": 197e12, "v5litepod": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v3": 123e12,
    "v2": 45e12,
    "v6e": 918e12, "trillium": 918e12,
}


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, val in _PEAK_FLOPS.items():
        if key in kind:
            return val
    return None


def _read_cpu_baseline() -> float:
    for parent in [pathlib.Path(__file__).resolve().parent.parent,
                   pathlib.Path.cwd()]:
        p = parent / "BASELINE_cpu.json"
        if p.exists():
            try:
                return float(json.loads(p.read_text())["images_per_sec"])
            except Exception:
                pass
    return _DEFAULT_CPU_BASELINE


def _cost_flops(compiled) -> float:
    """Flops per execution from XLA's cost analysis (version-tolerant)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _bench_ws_fused(iters: int = 50, batch_size: int = 128) -> dict:
    """Fused Pallas WS kernel: throughput + on-device parity vs the XLA
    path, for every weight mode and both named kernels."""
    import jax
    import jax.numpy as jnp
    from .ops import NAMED_FILTERS_2D, ws_attack
    from .ops.pallas_ws import ws_attack_fused

    rng = np.random.default_rng(1)
    pixels = jax.device_put(
        rng.integers(0, 256, (batch_size, 512, 512)).astype("uint8"))

    parity = {}
    for kname in ("KB", "AVG"):
        for weighted in (0, 1, -1):
            fused = np.asarray(
                ws_attack_fused(pixels, kname, weighted=weighted))
            xla = np.asarray(jax.jit(
                lambda p: ws_attack(
                    p, pixel_kernel=NAMED_FILTERS_2D[kname],
                    weighted=weighted))(pixels))
            parity[f"{kname}_w{weighted}"] = float(
                np.max(np.abs(fused - xla)))

    # Time the kernel FOLDED ON DEVICE (one dispatch), not as `iters`
    # host dispatches: each dispatch rides the axon tunnel, whose RTT
    # jitter made the old reading swing 97k-132k img/s run to run while
    # the chip did the same work — the kernel itself runs ~0.47 ms per
    # 128-image batch, far below the tunnel floor.  The pixels are
    # carried through the loop with a roll so XLA cannot hoist the
    # loop-invariant pallas call (verified: without the carry the whole
    # loop collapses to one call); a roll-only twin loop is timed and
    # subtracted so neither the roll nor the one dispatch RTT is
    # charged to the kernel.  NOTE: block_until_ready on the loop's
    # tuple output returns early under the axon backend — materialize a
    # scalar (float(...)) to actually fence.
    def timed(with_kernel: bool) -> float:
        @jax.jit
        def loop(p):
            def body(i, carry):
                acc, q = carry
                if with_kernel:
                    acc = acc + ws_attack_fused(q, "KB", weighted=0).sum()
                else:
                    acc = acc + q[0, 0, 0].astype(jnp.float32)
                return (acc, jnp.roll(q, 1, axis=0))
            acc, q = jax.lax.fori_loop(
                0, iters, body, (jnp.float32(0), p))
            return acc + q[0, 0, 0].astype(jnp.float32)

        float(loop(pixels))  # compile outside the clock
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(pixels))
            best = min(best, time.perf_counter() - t0)
        return best

    t_kernel, t_roll = timed(True), timed(False)
    # measurement sanity (ADVICE r4): if the roll-only twin is not
    # clearly cheaper than the kernel loop, the subtraction is noise and
    # a clamped dt would report an astronomical rate with floor_ok=true,
    # silently defeating the regression tripwire — fail the floor
    # instead and publish both raw times for the record
    measured_ok = t_kernel > 1.2 * t_roll
    dt = max(t_kernel - t_roll, 1e-9)
    ips = batch_size * iters / dt
    # throughput floor (VERDICT r3 weak-point 6): the device-folded
    # measurement reads ~267k img/s on the same kernel the dispatch
    # loop read as 118-132k (r2/r3 numbers were tunnel-bound, not
    # kernel-bound) — a drop below 200k is a real kernel regression
    # and must be surfaced deliberately rather than drift silently
    floor = 200_000.0
    return {
        "images_per_sec": round(ips, 1),
        "floor_images_per_sec": floor,
        "floor_ok": bool(measured_ok and ips >= floor),
        "measurement_ok": bool(measured_ok),
        "t_kernel_s": round(t_kernel, 6),
        "t_roll_s": round(t_roll, 6),
        "max_abs_diff_vs_xla": max(parity.values()),
        "parity_by_mode": {k: round(v, 9) for k, v in parity.items()},
    }


def _bench_decode_only(repeats: int = 40) -> dict:
    """Host-side PNG decode rate of the native loader on the fixture
    covers (ms/img, best-of-5 to shed scheduler noise).  Reported on
    every platform — the decode path is pure host work, so its number is
    meaningful even when the bench runs on the CPU outage fallback where
    the TPU-gated `e2e_decode` sweep is unavailable."""
    from .data import pipeline

    native = pipeline._get_native()
    root = pathlib.Path("/root/reference/data/images")
    if native is None or not root.exists():
        return {"error": "native loader or fixture dataset unavailable"}
    paths = sorted(root.glob("*.png"))
    if not paths:
        return {"error": "no fixture covers"}
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(repeats):
            native.decode_gray_batch(paths, threads=1)
        best = min(best,
                   (time.perf_counter() - t0) / (repeats * len(paths)))
    # floor guard (same spirit as ws_fused's), but RELATIVE to the PIL
    # reader measured under the same machine load — an absolute ms floor
    # trips on a busy host, while the failure this guards against (the
    # libdeflate+wavefront fast path silently degrading to the
    # libpng/PIL-class path) halves the ratio regardless of load.
    # Measured: 3.3-4x.
    import numpy as np
    from .io import imread_gray_u8
    t0 = time.perf_counter()
    for _ in range(max(1, repeats // 8)):
        for p in paths:
            np.asarray(imread_gray_u8(p))
    pil = (time.perf_counter() - t0) / (max(1, repeats // 8) * len(paths))
    speedup = pil / best if best > 0 else float("inf")
    return {"decode_ms_per_img": round(best * 1e3, 3),
            "pil_ms_per_img": round(pil * 1e3, 3),
            "images": len(paths),
            "speedup_vs_pil": round(speedup, 2),
            "floor_speedup": 2.0,
            "floor_ok": bool(speedup >= 2.0)}


def _bench_e2e_decode(model, variables, batch_size: int = 32,
                      repeats: int = 4) -> dict:
    """PNG-on-disk -> beta_hat throughput including host decode (the
    boundary the headline metric deliberately excludes), native C++
    loader vs the PIL thread fallback.  Uses the full fixture catalog
    with the decode cache OFF so every image is really decoded."""
    import jax
    import jax.numpy as jnp
    import pandas as pd
    from .data import iterate_batches, pipeline
    from .data.catalog import collect_files
    from .ops import ws_estimate_unet
    from .ws.unet_eval import infer_unet

    root = pathlib.Path("/root/reference/data")
    if not root.exists():
        return {"error": "fixture dataset unavailable"}
    df = collect_files(root, ["images*", "stego*"])
    df = pd.concat([df] * repeats).reset_index(drop=True)

    @jax.jit
    def step(pixels_u8):
        x = pixels_u8.astype(jnp.float32)
        return ws_estimate_unet(x, infer_unet(model, variables, x))

    # compile outside the timed region
    jax.block_until_ready(step(jnp.zeros(
        (batch_size, 512, 512), jnp.uint8)))

    out = {"images": len(df)}
    try:
        for label, use_native in (("native", True), ("pil", False)):
            pipeline.force_native(use_native)
            if use_native:
                out["native_available"] = pipeline._get_native() is not None
            t0 = time.perf_counter()
            done = []
            for batch in iterate_batches(root, df, batch_size,
                                         prefetch=2, cache=False):
                done.append(step(jnp.asarray(batch.pixels)))
            jax.block_until_ready(done)
            out[f"{label}_images_per_sec"] = round(
                len(df) / (time.perf_counter() - t0), 1)
        # the REAL eval-pipeline scenario (VERDICT r3 item 5): the roc
        # sweep visits the same catalog once per (model, method, alpha)
        # configuration; since round 4 the sweeps decode each image once
        # (pipeline decode cache).  Measured as `repeats` passes over the
        # catalog with the cache on, cold cache included in the clock.
        pipeline.force_native(True)
        pipeline.clear_decode_cache()
        t0 = time.perf_counter()
        done = []
        for _ in range(repeats):
            for batch in iterate_batches(root, df[: len(df) // repeats],
                                         batch_size, prefetch=2,
                                         cache=True, device_cache=True):
                done.append(step(jnp.asarray(batch.pixels)))
        jax.block_until_ready(done)
        out["sweep_images_per_sec"] = round(
            len(df) / (time.perf_counter() - t0), 1)
        out["sweep_passes"] = repeats
    finally:
        pipeline.force_native(None)
        pipeline.clear_decode_cache()
    return out


def _tpu_reachable() -> bool:
    """Axon tunnels every TPU RPC through a local relay; if the relay
    port is closed the first jax.devices() blocks forever instead of
    failing.  Probe it so the bench degrades to CPU with a marker
    rather than hanging the driver."""
    import importlib.util
    import os
    import socket
    if os.environ.get("WSUNET_ASSUME_TPU") == "1":
        return True  # escape hatch: a TPU not behind the axon relay
    # Decide by whether the TPU plugin is installed, NOT by the env
    # value: the axon plugin ignores a JAX_PLATFORMS=cpu override, so
    # e.g. `JAX_PLATFORMS=cpu python bench.py` would still initialize
    # the TPU backend and hang on a dead relay if we trusted the env.
    if importlib.util.find_spec("libtpu") is None:
        return True  # no TPU plugin at all; let jax pick its default
    try:
        with socket.create_connection(("127.0.0.1", 8082), 2):
            pass
    except OSError:
        return False
    # An open port is necessary but not sufficient: the 2026-08-19 relay
    # outage kept the local listener accepting (device enumeration
    # worked) while the remote compute path was dead, so the first
    # execution blocked forever.  Probe a tiny real computation in a
    # throwaway subprocess with a timeout — a wedged axon connection
    # never recovers in-process, so the probe must not run here.
    import subprocess
    import sys
    try:
        env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "print(float(jnp.ones((8, 8)).sum()))"],
            capture_output=True, timeout=120, text=True, env=env)
        return p.returncode == 0 and "64.0" in p.stdout
    except (subprocess.TimeoutExpired, OSError):
        return False


def run_bench(dtype: str = "bfloat16", iters: int = 20,
              batch_size: int = 128, warmup: int = 3) -> dict:
    import jax
    import jax.numpy as jnp

    tpu_unreachable = not _tpu_reachable()
    if tpu_unreachable:
        # smallest honest measurement: the point of the fallback is a
        # fast, parseable JSON line with the outage marker, not a number
        jax.config.update("jax_platforms", "cpu")
        batch_size, iters, warmup = 2, 2, 1
    from .ops import ws_estimate_unet
    from .ws.unet_eval import infer_unet

    compute_dtype = jnp.dtype(dtype)
    precision = (jax.lax.Precision.DEFAULT if compute_dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    from .models.unet import UNet
    import os
    mode = os.environ.get("WSUNET_BENCH_FAST_CONV", "borderfix")
    fast = False
    if jax.devices()[0].platform == "tpu":
        # default "borderfix": SAME conv + border corrections (pure XLA,
        # exact; 700.5 vs 439 img/s measured on v5e).  "0": plain
        # reflect-pad XLA, kept for the pad-cost ablation.  (The Pallas
        # fused-conv option was retired in round 4:
        # experiments/pallas_reflect_conv.py.)
        fast = "borderfix" if mode == "borderfix" else False
    model = UNet(nsteps=2, compute_dtype=compute_dtype, precision=precision,
                 fast_conv=fast)

    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        key, jnp.zeros((1, 512, 512, 1), jnp.float32))
    variables = params

    @jax.jit
    def step(pixels_u8):
        x = pixels_u8.astype(jnp.float32)
        x_hat = infer_unet(model, variables, x)
        beta, l1 = ws_estimate_unet(x, x_hat)
        return beta, l1

    rng = np.random.default_rng(0)
    pixels = jax.device_put(
        rng.integers(0, 256, (batch_size, 512, 512)).astype("uint8"))

    # flops accounting always uses the pure-XLA model: cost analysis does
    # not see inside Pallas custom calls (same math either way)
    ref_model = UNet(nsteps=2, compute_dtype=compute_dtype,
                     precision=precision, fast_conv=False)

    @jax.jit
    def ref_step(pixels_u8):
        x = pixels_u8.astype(jnp.float32)
        x_hat = infer_unet(ref_model, variables, x)
        return ws_estimate_unet(x, x_hat)

    flops_per_exec = _cost_flops(
        jax.jit(ref_step).lower(pixels).compile())

    fast_conv_used = fast
    try:
        jax.block_until_ready(step(pixels))
    except Exception as e:
        # fused-conv compile failure must not kill the headline number:
        # fall back to the XLA path and record the degradation
        fast_conv_used = False
        fast_conv_error = f"{type(e).__name__}: {str(e)[:200]}"
        step = ref_step

    for _ in range(warmup):
        jax.block_until_ready(step(pixels))
    # pipelined dispatch: enqueue all iterations, block once — measures
    # device throughput, not host-dispatch round-trip latency (which is
    # large over the tunneled axon transport)
    t0 = time.perf_counter()
    results = [step(pixels) for _ in range(iters)]
    jax.block_until_ready(results)
    dt = time.perf_counter() - t0

    ips = batch_size * iters / dt
    baseline = _read_cpu_baseline()
    device = jax.devices()[0]
    peak = _peak_flops(device)
    out = {
        "metric": f"images/sec/chip UNet+WS inference "
                  f"(unet_2, 512x512, {dtype}, batch {batch_size})",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / baseline, 2),
        "platform": device.platform,
        "device": str(device),
        "flops_per_image": round(flops_per_exec / batch_size / 1e9, 2),
        "tflops_per_sec": round(flops_per_exec * iters / dt / 1e12, 2),
        "fast_conv": fast_conv_used,
    }
    if tpu_unreachable:
        out["tpu_unreachable"] = True  # axon relay down; CPU fallback
    if not fast_conv_used and fast:
        out["fast_conv_error"] = fast_conv_error
    if peak:
        out["mfu"] = round(flops_per_exec * iters / dt / peak, 4)
    if device.platform == "tpu":
        # headline floor guards (VERDICT r4 item 6, mirroring the
        # ws_fused/decode_only guards): r4 measured 700.5 img/s at MFU
        # 0.727 on the borderfix path — a drop below 650 / 0.70 means a
        # real regression (e.g. a silent borderfix compile downgrade)
        # and must be flagged deliberately, not shipped as drift
        out["floor_value"] = 650.0
        out["floor_mfu"] = 0.70
        out["floor_ok"] = bool(
            ips >= out["floor_value"]
            and out.get("mfu", 0.0) >= out["floor_mfu"])
    # single-image serving latency: the dedicated batch-1 path (serve.py
    # — bf16 stack, fixed shape), reported with the
    # transport floor so the number is readable net of the tunneled axon
    # dispatch round trip (VERDICT r3 item 4).  Skipped on the outage
    # fallback: a 512x512 batch-1 compile + 30 blocking passes on the
    # single host core adds minutes to a path whose whole point is a
    # fast marker line.
    if not tpu_unreachable:
        try:
            from .serve import UNetWSServer, measure_latency
            server = UNetWSServer(model, variables)
            out.update(measure_latency(server))
        except Exception as e:
            out["latency_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    try:
        out["decode_only"] = _bench_decode_only()
    except Exception as e:
        out["decode_only"] = {"error": f"{type(e).__name__}: {e}"}
    if device.platform == "tpu":
        try:
            out["ws_fused"] = _bench_ws_fused(batch_size=batch_size)
        except Exception as e:  # fused kernel must not break the headline
            out["ws_fused"] = {"error": f"{type(e).__name__}: {e}"}
        try:
            out["e2e_decode"] = _bench_e2e_decode(model, variables)
        except Exception as e:
            out["e2e_decode"] = {"error": f"{type(e).__name__}: {e}"}
    return out


def main():
    print(json.dumps(run_bench()))


if __name__ == "__main__":
    main()
