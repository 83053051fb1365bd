"""EfficientNet-B0 detector inference.

Parity: reference src/detector/evaluate.py —
- ``infer_b0``: timm-style transform (center-crop 512, grayscale, optional
  LSBr-reference plane, ImageNet green-channel normalization) -> model ->
  softmax P(stego) (evaluate.py:30-58), batched.
- ``run``: cover + LSBR + HILLR sweep producing the b0.csv schema
  (evaluate.py:179-215).
"""

import pathlib

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp

from ..data import iterate_batches, precovers, stego_spatial
from ..data.transforms import center_crop, lsbr_reference, normalize
from ..models import get_b0
from ..train.checkpoint import load_checkpoint, load_config
from ..utils.registry import get_model_name

# ImageNet green-channel moments (evaluate.py:37-38 takes [1:2] of the
# IMAGENET_DEFAULT_MEAN/STD constants).
IMAGENET_GREEN_MEAN = 0.456
IMAGENET_GREEN_STD = 0.224


def infer_b0(model, variables, x: jnp.ndarray,
             use_lsbr_reference: bool = False) -> jnp.ndarray:
    """[B, H, W] f32 (0..255) -> softmax P(stego) [B]."""
    xc = center_crop(x[..., None], 512) / 255.0
    if use_lsbr_reference:
        xc = lsbr_reference(xc)
    xc = normalize(xc, IMAGENET_GREEN_MEAN, IMAGENET_GREEN_STD)
    logits = model.apply(variables, xc, train=False)
    return jax.nn.softmax(logits, axis=1)[:, 1]


def load_pretrained_b0(
    model_dir: pathlib.Path,
    model_name: str,
    compute_dtype=jnp.float32,
):
    """Rebuild the B0 from its config.json and restore the best checkpoint
    (parity: detector/models.py:69-81)."""
    exp_dir = pathlib.Path(model_dir) / model_name
    config = load_config(exp_dir)
    in_channels = 1 if config.get("grayscale", True) else 3
    in_channels += 3 if config.get("demosaic_oracle") else 0
    in_channels += 1 if config.get("lsbr_reference") else 0
    model = get_b0(
        in_channels=in_channels,
        no_stem_stride=config.get("no_stem_stride", False),
        quadratic_stem=config.get("quadratic_stem", False),
        parity_features=config.get("parity_features", False),
        norm=config.get("norm", "batch"),
        compute_dtype=compute_dtype,
    )
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, in_channels), jnp.float32))
    # norm="group" models carry no batch_stats collection
    state = load_checkpoint(exp_dir, {
        "params": template["params"],
        "batch_stats": template.get("batch_stats", {}),
    }, "best")
    return model, {"params": state["params"],
                   "batch_stats": state.get("batch_stats", {})}, config


def get_b0_detector(
    model_dir: pathlib.Path,
    model_name: str,
    lsbr_reference: bool = False,
    **_ignored,
):
    """Detector callable [B, H, W] f32 -> scores [B]
    (parity: detector/evaluate.py:83-97).  Compiled with the batch axis
    sharded over every visible device (VERDICT r4 item 1)."""
    from ..parallel import jit_sharded
    model, variables, _ = load_pretrained_b0(model_dir, model_name)

    @jit_sharded
    def detect(x):
        return infer_b0(model, variables, x,
                        use_lsbr_reference=lsbr_reference)

    return detect


def _score_frame(root, df, detect, batch_size, threads) -> pd.DataFrame:
    """Mesh-sharded scoring sweep: batch axis over all devices, strided
    row shards per host (cf. ws/estimate.attack_sweep — replaces the
    reference's serial per-image loop, detector/evaluate.py:61-80)."""
    from ..parallel import (
        allgather_rows, batch_sharding, cache_on_device, fetch_rows,
        host_shard, place, round_batch)

    df_local, n_true = host_shard(df)
    batch_size = round_batch(batch_size)
    dev_cache = cache_on_device()
    frames = []
    for batch in iterate_batches(root, df_local, batch_size,
                                 threads=threads, prefetch=2, cache=True,
                                 device_cache=dev_cache,
                                 sharding=batch_sharding()
                                 if dev_cache else None):
        scores = fetch_rows(detect(
            place(batch.pixels).astype(jnp.float32)))
        out = batch.rows.copy()
        m = batch.mask[: len(out)]
        out["output"] = np.where(m, scores[: len(out)], np.nan)
        frames.append(out)
    local = pd.concat(frames).reset_index(drop=True).iloc[:n_true]
    out = df.reset_index(drop=True).copy()
    out["output"] = allgather_rows(local["output"].to_numpy(), len(out))
    out["prediction"] = out["output"] > 0.5
    return out


def run(
    data_path: pathlib.Path,
    model_dir: pathlib.Path,
    stego_method: str = "LSBR",
    eval_methods=("LSBR", "HILLR"),
    model_name: str = None,
    no_stem_stride: bool = False,
    lsbr_reference: bool = False,
    batch_size: int = 8,
    threads: int = 8,
    split: str = None,
    take_num_images: int = None,
) -> pd.DataFrame:
    """Score covers + stego sweeps with one trained B0
    (parity: detector/evaluate.py __main__, results/detection/b0.csv)."""
    model_dir = pathlib.Path(model_dir)
    if model_name is None:
        model_name = get_model_name(
            model_dir, stego_method,
            no_stem_stride=no_stem_stride, lsbr_reference=lsbr_reference)
    detect = get_b0_detector(
        model_dir / stego_method, model_name, lsbr_reference=lsbr_reference)

    select = dict(split=split, take_num_images=take_num_images)
    frames = [_score_frame(
        data_path, precovers(data_path, **select), detect,
        batch_size, threads)]
    for sm in eval_methods:
        df_s = stego_spatial(data_path, stego_method=sm, **select)
        if len(df_s):
            frames.append(_score_frame(
                data_path, df_s, detect, batch_size, threads))
    return pd.concat(frames).reset_index(drop=True)
