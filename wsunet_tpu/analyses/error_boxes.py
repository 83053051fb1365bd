"""Prediction-error box analysis, bucketed by KB-filter error.

Parity: reference src/error_boxes.py — absolute-residual populations for
KB/AVG/U-Net predictors over the test split, deterministically subsampled
per image via the filename-hash seed, ordered by the anchor (KB) error,
split at edges {.5, 1.5, 3.5, 7.5}, then per-bucket box quantiles
(min, q25-1.5IQR, q25, q50, q75, q75+1.5IQR, max) written in the
ae_boxes_3.csv schema, plus the square-root-scaled seaborn boxplot.
"""

import collections
import pathlib
import typing

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp

from ..data import load_images, precovers
from ..ops import NAMED_FILTERS, filter_residuals
from ..ops.filters import taps_to_kernel2d
from ..utils import filename_to_image_seed, iqr_interval, quantile
from ..utils.registry import get_model_name
from ..ws.unet_eval import get_unet_estimator

EDGE_VALUES = [.5, 1.5, 3.5, 7.5]


def subset_residual(resid: np.ndarray, fname: str, size: int = None):
    """Deterministic per-image pixel subsample
    (parity: error_boxes.py:31-43)."""
    if not size:
        return resid.flatten()
    rng = np.random.default_rng(filename_to_image_seed(fname))
    selected = rng.integers(resid.size, size=size)
    selected = (selected // resid.shape[1], selected % resid.shape[1])
    return resid[selected]


def _filter_abs_residuals(data_path, df, filter_name, num_pixels):
    kernel2d = taps_to_kernel2d(NAMED_FILTERS[filter_name])
    pixels = load_images(data_path, list(df["name"])).astype("float32")
    resid = np.asarray(filter_residuals(jnp.asarray(pixels), kernel2d))
    return np.concatenate([
        np.abs(subset_residual(resid[i], row["name"], num_pixels))
        for i, (_, row) in enumerate(df.iterrows())])


def _unet_abs_residuals(data_path, df, predictor, num_pixels):
    pixels = load_images(data_path, list(df["name"])).astype("float32")
    x_hat = np.asarray(predictor(jnp.asarray(pixels)))
    resid = pixels[:, 1:-1, 1:-1] - x_hat
    return np.concatenate([
        np.abs(subset_residual(resid[i], row["name"], num_pixels))
        for i, (_, row) in enumerate(df.iterrows())])


def bucket_quantiles(
    results: "collections.OrderedDict[str, np.ndarray]",
    anchor: str,
) -> pd.DataFrame:
    """Order every population by the anchor error, split at EDGE_VALUES,
    compute per-bucket box statistics (parity: error_boxes.py:205-273)."""
    order = np.argsort(results[anchor])
    points = collections.OrderedDict(
        (k, v.flatten()[order]) for k, v in results.items())
    edges = [np.argmin(points[anchor] <= e) - 1 for e in EDGE_VALUES]
    edges = [0] + edges + [len(points[anchor])]
    edge_values = [0] + EDGE_VALUES + [np.inf]

    frames = []
    for k, x in points.items():
        for j in range(len(edges) - 1):
            frames.append(pd.DataFrame({
                "Type": k,
                "edge_interval": f"{edge_values[j]}-{edge_values[j + 1]}",
                "values": x[edges[j]:edges[j + 1]].astype("float64"),
            }))
    df = pd.concat(frames)
    out = df.groupby(["Type", "edge_interval"]).agg({"values": [
        "min",
        iqr_interval(.25, sign=-1.5),
        quantile(.25),
        quantile(.5),
        quantile(.75),
        iqr_interval(.75, sign=1.5),
        "max",
    ]})
    out.columns = [c[1] for c in out.columns.values]
    return out.reset_index().sort_values(["edge_interval", "Type"])


def run_error_boxes(
    data_path: pathlib.Path,
    model_dir: pathlib.Path = None,
    split: str = "split_te.csv",
    shuffle_seed: int = 12345,
    num_pixels: int = None,
    num_images: int = None,
    unet_models: typing.Sequence[typing.Tuple[str, str]] = (
        ("dropout", "UNet_l1"), ("LSBR", "UNet_l1ws")),
    outfile: pathlib.Path = None,
) -> pd.DataFrame:
    """Full analysis (parity: error_boxes.py __main__ -> ae_boxes_3.csv)."""
    df = precovers(data_path, split=split, shuffle_seed=shuffle_seed,
                   take_num_images=num_images)

    results = collections.OrderedDict()
    results["KB"] = _filter_abs_residuals(data_path, df, "KB", num_pixels)
    results["AVG"] = _filter_abs_residuals(data_path, df, "AVG", num_pixels)
    for method, label in unet_models or ():
        try:
            model_name = get_model_name(model_dir, method)
        except (RuntimeError, TypeError):
            continue
        predictor = get_unet_estimator(
            pathlib.Path(model_dir) / method, model_name)
        results[label] = _unet_abs_residuals(
            data_path, df, predictor, num_pixels)

    out = bucket_quantiles(results, anchor="KB")
    if outfile is not None:
        outfile = pathlib.Path(outfile)
        outfile.parent.mkdir(parents=True, exist_ok=True)
        out.to_csv(outfile, index=False)
        _plot(results, out, outfile.with_suffix(".png"))
    return out


def _plot(results, df_q, outfile):
    """Square-root-scaled boxplot (parity: error_boxes.py:153-256)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    frames = []
    order = np.argsort(results["KB"])
    edges = [np.argmin(results["KB"][order] <= e) - 1 for e in EDGE_VALUES]
    edges = [0] + edges + [len(order)]
    edge_values = [0] + EDGE_VALUES + [np.inf]
    for k, v in results.items():
        x = v.flatten()[order]
        for j in range(len(edges) - 1):
            frames.append(pd.DataFrame({
                "Type": k,
                "edge_interval": f"{edge_values[j]}-{edge_values[j + 1]}",
                "values": x[edges[j]:edges[j + 1]],
            }))
    df = pd.concat(frames)
    fig, ax = plt.subplots()
    sns.boxplot(df, x="edge_interval", y="values", hue="Type",
                flierprops={"marker": "x", "alpha": .1}, ax=ax)
    ax.set_ylim(0, 64)
    ax.set_yscale("function", functions=(np.sqrt, np.square))
    ax.yaxis.set_major_locator(matplotlib.ticker.FixedLocator(
        [0, 1, 4, 9, 16, 25, 36, 49, 64]))
    ax.set_xlabel("Pixels at given AE of KB_gray filter")
    ax.set_ylabel("Absolute Error (AE)")
    fig.savefig(outfile, dpi=300, bbox_inches="tight")
    plt.close(fig)
