"""One-process TPU perf session: conv-path variants of the headline
UNet+WS pipeline (VERDICT r2 item 2).

Measures images/sec for fast_conv in {False (reflect-pad XLA),
"borderfix" (SAME conv + fused border adds), True (double-buffered
Pallas kernel)}, checks cross-path numerics on the same weights, and
optionally writes xprof traces per mode (WSUNET_PERF_TRACE=<dir>).

Run between training stages (the TPU is exclusive to one process):
    python scripts/round3_perf_session.py [batch] [iters]
"""
import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np                                  # noqa: E402
import jax                                          # noqa: E402
import jax.numpy as jnp                             # noqa: E402


def make_step(fast, dtype):
    from wsunet_tpu.models.unet import UNet
    from wsunet_tpu.ops import ws_estimate_unet
    from wsunet_tpu.ws.unet_eval import infer_unet

    precision = (jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    model = UNet(nsteps=2, compute_dtype=dtype, precision=precision,
                 fast_conv=fast)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 1), jnp.float32))

    @jax.jit
    def step(pixels_u8):
        x = pixels_u8.astype(jnp.float32)
        x_hat = infer_unet(model, variables, x)
        return ws_estimate_unet(x, x_hat)

    return step


def main(batch=128, iters=20, warmup=3):
    rng = np.random.default_rng(0)
    pixels = jax.device_put(
        rng.integers(0, 256, (batch, 512, 512)).astype("uint8"))
    trace_dir = os.environ.get("WSUNET_PERF_TRACE")

    out = {}
    betas = {}
    for mode, tag in [(False, "xla_pad"), ("borderfix", "borderfix"),
                      (True, "pallas")]:
        step = make_step(mode, jnp.bfloat16)
        try:
            t_c = time.perf_counter()
            beta0 = jax.block_until_ready(step(pixels))[0]
            compile_s = time.perf_counter() - t_c
            betas[tag] = np.asarray(beta0)
            for _ in range(warmup):
                jax.block_until_ready(step(pixels))
            t0 = time.perf_counter()
            res = [step(pixels) for _ in range(iters)]
            jax.block_until_ready(res)
            dt = time.perf_counter() - t0
            out[tag] = {"images_per_sec": round(batch * iters / dt, 1),
                        "compile_s": round(compile_s, 1)}
            if trace_dir:
                with jax.profiler.trace(str(pathlib.Path(trace_dir) / tag)):
                    jax.block_until_ready(
                        [step(pixels) for _ in range(3)])
        except Exception as e:
            out[tag] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        print(tag, json.dumps(out[tag]), flush=True)

    ref = betas.get("xla_pad")
    for tag, b in betas.items():
        if ref is not None and tag != "xla_pad":
            out[tag]["beta_max_diff_vs_xla"] = float(
                np.max(np.abs(b - ref)))
    print(json.dumps(out), flush=True)
    (REPO / "logs").mkdir(exist_ok=True)
    with open(REPO / "logs" / "perf_session.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
