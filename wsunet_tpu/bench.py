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
"""

import json
import pathlib
import time

import numpy as np

_DEFAULT_CPU_BASELINE = 0.2957535109920724  # images/sec, BASELINE_cpu.json


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


def run_bench(dtype: str = "bfloat16", iters: int = 20,
              batch_size: int = 128, warmup: int = 3) -> dict:
    import jax
    import jax.numpy as jnp
    from .ops import ws_estimate_unet
    from .ws.unet_eval import infer_unet

    compute_dtype = jnp.dtype(dtype)
    precision = (jax.lax.Precision.DEFAULT if compute_dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    from .models.unet import UNet
    model = UNet(nsteps=2, compute_dtype=compute_dtype, precision=precision)

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
    return {
        "metric": f"images/sec/chip UNet+WS inference "
                  f"(unet_2, 512x512, {dtype}, batch {batch_size})",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / baseline, 2),
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }


def main():
    print(json.dumps(run_bench()))


if __name__ == "__main__":
    main()
