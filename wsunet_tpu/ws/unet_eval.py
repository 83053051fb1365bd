"""U-Net inference + WS prediction-error evaluation.

Parity: reference src/unet/evaluate.py —
- ``infer_unet``: transform (center-crop 512, /255) -> model -> crop 1-px
  border -> x255 (evaluate.py:31-52), batched.
- ``run``: cover + LSBR + HILLR sweeps computing per-image (beta_hat, l1)
  with the *unet* WS variant (mean, unclipped; evaluate.py:109-139),
  producing the ws_<method>.csv schema.
- model loading via config.json + best checkpoint
  (evaluate.py:151-188, model registry in utils.registry).
"""

import os
import pathlib

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp

from ..data import iterate_batches, precovers, stego_spatial
from ..data.transforms import center_crop
from ..models import get_model
from ..ops import ws_estimate_unet
from ..train.checkpoint import load_checkpoint, load_config
from ..utils.registry import get_model_name


def infer_unet(model, variables, x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W] f32 pixels (0..255) -> [B, 510, 510] prediction (0..255)."""
    xc = center_crop(x[..., None], 512) / 255.0
    y = model.apply(variables, xc, deterministic=True)
    return y[:, 1:-1, 1:-1, 0] * 255.0


def load_pretrained_unet(
    model_path: pathlib.Path,
    model_name: str,
    compute_dtype=jnp.float32,
    fast_conv: str = "auto",
):
    """Build the model from its config.json and restore the best checkpoint
    (parity: unet/evaluate.py:162-188 — in/out channels forced to 1 and
    drop_rate to 0 at eval time).

    ``fast_conv="auto"`` resolves to the border-corrected SAME conv on
    TPU (pure XLA, exact reflect math, no pad materialization — 700.5
    img/s = 97.6% of the pad-free ceiling, results/perf_traces/
    ANALYSIS.md) and to the plain reflect-pad path on CPU.  The fused
    Pallas reflect-conv experiment was retired in round 4
    (experiments/pallas_reflect_conv.py): parity-correct but slower than
    the borderfix path, which leaves <2.4% headroom for any fused conv."""
    exp_dir = pathlib.Path(model_path) / model_name
    config = load_config(exp_dir)
    if fast_conv == "auto":
        fast_conv = ("borderfix"
                     if jax.devices()[0].platform == "tpu" else False)
    model = get_model(
        config["network"], in_channels=1, out_channels=1,
        drop_rate=None, compute_dtype=compute_dtype, fast_conv=fast_conv)
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 1), jnp.float32))
    state = load_checkpoint(exp_dir, {"params": template["params"]}, "best")
    return model, {"params": state["params"]}, config


def get_unet_estimator(
    model_path: pathlib.Path,
    model_name: str,
    compute_dtype=jnp.float32,
    **_ignored,
):
    """Pixel-estimator callable for ws_attack
    (parity: unet/__init__.py:110-121)."""
    model, variables, _ = load_pretrained_unet(
        model_path, model_name, compute_dtype=compute_dtype)

    def predict(x):
        return infer_unet(model, variables, x)

    return predict


def _predict_frame(
    root, df, model, variables, batch_size: int, threads: int
) -> pd.DataFrame:
    """Per-image (beta_hat, l1) over catalog rows.

    Mesh-sharded (VERDICT r4 item 1): the inference step's batch axis is
    sharded over every visible device and under multi-host each process
    handles its strided row shard (cf. ws/estimate.attack_sweep), the
    TPU replacement for the reference's per-image loop
    (src/unet/evaluate.py:142-149)."""
    from ..parallel import (
        allgather_rows, batch_sharding, cache_on_device, fetch_rows,
        host_shard, jit_sharded, place, round_batch)

    @jit_sharded
    def step(pixels):
        x = pixels.astype(jnp.float32)
        x_hat = infer_unet(model, variables, x)
        xc = center_crop(x[..., None], 512)[..., 0]
        return ws_estimate_unet(xc, x_hat)

    df_local, n_true = host_shard(df)
    batch_size = round_batch(batch_size)
    dev_cache = cache_on_device()
    frames = []
    for batch in iterate_batches(root, df_local, batch_size,
                                 threads=threads, prefetch=2, cache=True,
                                 device_cache=dev_cache,
                                 sharding=batch_sharding()
                                 if dev_cache else None):
        out_dev = step(place(batch.pixels))
        beta, l1 = fetch_rows(out_dev[0]), fetch_rows(out_dev[1])
        out = batch.rows.copy()
        m = batch.mask[: len(out)]
        out["beta_hat"] = np.where(m, beta[: len(out)], np.nan)
        out["l1"] = np.where(m, l1[: len(out)], np.nan)
        frames.append(out)
    local = pd.concat(frames).reset_index(drop=True).iloc[:n_true]
    out = df.reset_index(drop=True).copy()
    for col in ("beta_hat", "l1"):
        out[col] = allgather_rows(local[col].to_numpy(), len(out))
    return out


def run(
    data_path: pathlib.Path,
    model_dir: pathlib.Path,
    stego_method: str,
    eval_methods=("LSBR", "HILLR"),
    model_name: str = None,
    batch_size: int = 8,
    threads: int = 8,
    split: str = None,
    take_num_images: int = None,
) -> pd.DataFrame:
    """Cover + stego sweeps for one trained model
    (parity: unet/evaluate.py __main__, results/estimation/ws_<method>.csv)."""
    model_dir = pathlib.Path(model_dir)
    if model_name is None:
        model_name = get_model_name(model_dir, stego_method)
    model, variables, _ = load_pretrained_unet(
        model_dir / stego_method, model_name)

    select = dict(split=split, take_num_images=take_num_images)
    frames = [_predict_frame(
        data_path, precovers(data_path, **select), model, variables,
        batch_size, threads)]
    for sm in eval_methods:
        df_s = stego_spatial(data_path, stego_method=sm, **select)
        if len(df_s):
            frames.append(_predict_frame(
                data_path, df_s, model, variables, batch_size, threads))
    return pd.concat(frames).reset_index(drop=True)
