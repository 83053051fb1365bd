"""Gradient saliency of the U-Net predictor.

Parity: reference src/saliency.py:43-187.  Where the reference runs a
separate autograd pass (freeze params, ``pixel.backward()``), here the
saliency IS ``jax.grad`` of the selected output pixel w.r.t. the input —
the same jitted kernels serve forward and backward.

``sobel_locations`` ports the interesting-point finder (saliency.py:43-98):
Sobel gradients via the shared filter-conv primitive, then
gh/gv-ratio maxima and box-filtered gradient-magnitude extrema.
"""

import pathlib
import typing

import numpy as np
import jax
import jax.numpy as jnp

from ..io import imread_gray_u8
from ..ops import filter_predict
from ..utils.registry import get_model_name
from ..ws.unet_eval import load_pretrained_unet

SOBEL_H = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], dtype="float32")
SOBEL_V = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], dtype="float32")
BOX9 = np.ones((3, 3), dtype="float32")


def sobel_locations(fname: pathlib.Path) -> typing.Dict[str, tuple]:
    """gh_max / gv_max / g_max / g_min interesting points."""
    x = imread_gray_u8(fname).astype("float32")
    gh = np.asarray(filter_predict(jnp.asarray(x[None]), SOBEL_H))[0]
    gv = np.asarray(filter_predict(jnp.asarray(x[None]), SOBEL_V))[0]
    g = np.asarray(filter_predict(
        jnp.asarray(np.sqrt(gh ** 2 + gv ** 2)[None]), BOX9))[0]
    return {
        "gh_max": np.unravel_index(np.abs(gh / (.1 + gv)).argmax(), gh.shape),
        "gv_max": np.unravel_index(np.abs(gv / (.1 + gh)).argmax(), gv.shape),
        "g_max": np.unravel_index(g.argmax(), g.shape),
        "g_min": np.unravel_index(g.argmin(), g.shape),
    }


def render_dots(fname: pathlib.Path, outfile: pathlib.Path) -> pathlib.Path:
    """``saliency_image_dots.png``: the cover with the four interesting
    points marked as single red pixels (parity: saliency.py:89-96 inside
    get_locations — the reference applies the valid-conv grid indices to
    the full image without the +1 border offset; reproduced as-is so the
    artifact matches pixel-for-pixel)."""
    from PIL import Image

    x = imread_gray_u8(fname)
    y = np.repeat(x[..., None] if x.ndim == 2 else x, 3, axis=-1)
    for loc in sobel_locations(fname).values():
        y[loc[:2]] = [255, 0, 0]
    outfile = pathlib.Path(outfile)
    outfile.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(y).save(outfile)
    return outfile


def unet_saliency(
    fname: pathlib.Path,
    i: int,
    j: int,
    model_dir: pathlib.Path,
    stego_method: str = "LSBR",
    n: int = 8,
) -> np.ndarray:
    """(2n+1)x(2n+1) gradient patch of output pixel (i, j) w.r.t. the input
    (parity: saliency.py:101-187)."""
    model_name = get_model_name(model_dir, stego_method)
    model, variables, _ = load_pretrained_unet(
        pathlib.Path(model_dir) / stego_method, model_name)
    x = imread_gray_u8(fname).astype("float32")

    def pixel_of(x_img):
        y = model.apply(variables, (x_img / 255.0)[None, :, :, None],
                        deterministic=True)
        return y[0, i, j, 0]

    grad = jax.grad(pixel_of)(jnp.asarray(x))
    # the reference transform scales by 1/255 before the model; its
    # gradient is w.r.t. the scaled input, so divide ours accordingly
    slc = np.asarray(grad) * 255.0
    return slc[i - n:i + n + 1, j - n:j + n + 1]


def plot_saliency_grid(
    fname: pathlib.Path,
    model_dir: pathlib.Path,
    stego_method: str,
    points: typing.Sequence[typing.Tuple[int, int]],
    outfile: pathlib.Path,
    vlim: float = None,
):
    """2x2 coolwarm grid (parity: saliency.py:202-240)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if vlim is None:
        vlim = 1.0 if stego_method == "dropout" else 0.5
    fig, ax = plt.subplots(2, 2)
    im = None
    for idx, (i, j) in enumerate(points):
        sal = unet_saliency(fname, i, j, model_dir, stego_method)
        im = ax[idx // 2, idx % 2].imshow(
            sal, vmin=-vlim, vmax=vlim, cmap="coolwarm")
    fig.subplots_adjust(right=0.85)
    cbar_ax = fig.add_axes([0.88, 0.15, 0.04, 0.7])
    fig.colorbar(im, cax=cbar_ax)
    outfile = pathlib.Path(outfile)
    outfile.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(outfile, dpi=300, bbox_inches="tight")
    plt.close(fig)
    return outfile
