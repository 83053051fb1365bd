"""Difference-image contour maps.

Parity: reference src/contour.py:15-128 — |x - x_hat| rendered as an
inverted-gray image for the U-Net and KB predictors on one image.
"""

import pathlib

import numpy as np
import jax
import jax.numpy as jnp

from ..io import imread_gray_u8
from ..ops import NAMED_FILTERS_2D, filter_predict
from ..utils.registry import get_model_name
from ..ws.unet_eval import get_unet_estimator


def difference_image(
    fname: pathlib.Path,
    model_name: str = "KB",
    model_dir: pathlib.Path = None,
    stego_method: str = "LSBR",
) -> np.ndarray:
    """x[1:-1,1:-1] - x_hat for a named filter or a trained U-Net."""
    x = imread_gray_u8(fname).astype("float32")
    if model_name in NAMED_FILTERS_2D:
        x_hat = np.asarray(filter_predict(
            jnp.asarray(x[None]), NAMED_FILTERS_2D[model_name]))[0]
    else:
        exp_name = get_model_name(model_dir, stego_method)
        predictor = get_unet_estimator(
            pathlib.Path(model_dir) / stego_method, exp_name)
        x_hat = np.asarray(predictor(jnp.asarray(x[None])))[0]
    return x[1:-1, 1:-1] - x_hat


def plot_contour(fname, d: np.ndarray, model_name: str, outdir: pathlib.Path):
    """Save |d| as contour_<model>_<stem>.png (parity: contour.py:15-36)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    outdir = pathlib.Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    fig, ax = plt.subplots()
    ax.imshow(np.abs(d), vmin=0, vmax=60, cmap="gray_r",
              interpolation="nearest")
    ax.set_axis_off()
    outname = outdir / f"contour_{model_name}_{pathlib.Path(fname).stem}.png"
    fig.savefig(outname, dpi=300, bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return outname
