"""Residual <-> embedding-change correlation analysis.

Parity: reference src/correlation.py:22-57 — for each cover-stego pair,
the Pearson-style correlation between the embedding-change mask
``d_s = stego - cover`` (border-cropped) and the predictor residual
``dhat_c = predict(stego) - cover``, plus a one-sided t-test p-value.

NOTE the reference normalizes by ``xhat_c.std()`` (the *prediction*'s
std), not ``dhat_c.std()`` — reproduced faithfully since the golden
correlation.csv numbers depend on it; the statistically-orthodox variant
is available via ``orthodox=True``.
"""

import pathlib
import typing

import numpy as np
import pandas as pd
import scipy.stats
import jax
import jax.numpy as jnp

from ..data import cover_stego_pairs, load_images
from ..ops import NAMED_FILTERS_2D, filter_predict
from ..utils.registry import get_model_name
from ..ws.unet_eval import get_unet_estimator


def pair_correlation(
    x_c: np.ndarray,
    x_s: np.ndarray,
    x_hat: np.ndarray,
    orthodox: bool = False,
) -> typing.Tuple[float, float]:
    """(correlation, p-value) for one pair; all arrays [H, W] cropped
    consistently (x_hat already border-cropped by the predictor)."""
    d_s = (x_s - x_c)[1:-1, 1:-1]
    dhat_c = x_hat - x_c[1:-1, 1:-1]
    cov = np.sum((dhat_c - dhat_c.mean()) * (d_s - d_s.mean())) / (d_s.size - 1)
    denom = dhat_c.std() if orthodox else x_hat.std()
    cor = cov / denom / d_s.std()
    test_val = np.abs(cor) / np.sqrt(1 - cor ** 2) * np.sqrt(d_s.size - 2)
    pval = scipy.stats.t.sf(test_val, d_s.size - 2)
    return float(cor), float(pval)


def _pairs_frame(data_path, stego_method, alpha, **order_kw):
    df = cover_stego_pairs(data_path, stego_method=stego_method, alpha=alpha,
                           **order_kw)
    return df[~df["name_s"].isna()]


def run_correlation(
    data_path: pathlib.Path,
    model_dir: pathlib.Path = None,
    filter_names=("1", "AVG9", "AVG", "KB"),
    unet_methods=("dropout", "LSBR", "HILLR"),
    stego_method: str = "LSBR",
    alpha: float = 1.0,
    orthodox: bool = False,
    split: str = None,
    take_num_images: int = None,
) -> typing.Tuple[pd.DataFrame, pd.DataFrame]:
    """Sweep filters + trained U-Nets; returns (per-pair df, median table)
    (parity: correlation.py __main__ -> results/estimation/correlation.csv)."""
    df = _pairs_frame(data_path, stego_method, alpha, split=split,
                      take_num_images=take_num_images)
    covers = load_images(data_path, list(df["name_c"])).astype("float32")
    stegos = load_images(data_path, list(df["name_s"])).astype("float32")

    rows = []

    def eval_predictor(model_label, predict):
        x_hats = np.asarray(predict(jnp.asarray(stegos)))
        for i, (_, row) in enumerate(df.iterrows()):
            cor, pval = pair_correlation(
                covers[i], stegos[i], x_hats[i], orthodox=orthodox)
            rows.append({
                "name_c": row["name_c"], "name_s": row["name_s"],
                "correlation": cor, "p-value": pval,
                "model_name": model_label,
            })

    for name in filter_names:
        kernel = NAMED_FILTERS_2D[name]
        eval_predictor(name, jax.jit(
            lambda x, k=kernel: filter_predict(x, k)))

    for method in unet_methods or ():
        try:
            model_name = get_model_name(model_dir, method)
        except (RuntimeError, TypeError):
            continue
        predictor = get_unet_estimator(
            pathlib.Path(model_dir) / method, model_name)
        from ..train.checkpoint import load_config
        loss = load_config(
            pathlib.Path(model_dir) / method / model_name).get("loss", "")
        eval_predictor(f"UNet_{method}_{loss}", predictor)

    res = pd.DataFrame(rows)
    model_names = res.model_name.unique().tolist()
    agg = res.groupby("model_name").agg(
        {"correlation": "median", "p-value": "median"})
    return res, agg.T[model_names]
