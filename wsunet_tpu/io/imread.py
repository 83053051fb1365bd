"""Image readers.

Parity: reference src/_defs/imread.py:8-27.

``imread4_*`` stacks [R, G, B, Y] where Y is the OpenCV BGR->GRAY luminance;
every evaluation path in the reference reads channel 3 (Y).  For grayscale
PNGs (the entire fixture set) all four channels are identical, so the fast
path ``imread_gray_u8`` (single-channel decode, used by the batched
pipeline) yields the same Y plane without the 4x decode cost.
"""

import numpy as np
from PIL import Image


def imread_u8(fname) -> np.ndarray:
    """Read image to HxWxC uint8 (C=1 for grayscale)."""
    x = np.array(Image.open(fname))
    if x.ndim == 2:
        x = x[..., None]
    return x


def imread_f32(fname) -> np.ndarray:
    return imread_u8(fname).astype("float32")


def imread4_u8(fname) -> np.ndarray:
    """Read image to HxWx4 uint8 channels [R, G, B, Y]."""
    import cv2

    x_bgr = cv2.imread(str(fname))
    if x_bgr is None:
        raise FileNotFoundError(fname)
    x_y = cv2.cvtColor(x_bgr, cv2.COLOR_BGR2GRAY)[..., None]
    return np.concatenate([x_bgr[..., ::-1], x_y], axis=-1)


def imread4_f32(fname) -> np.ndarray:
    return imread4_u8(fname).astype("float32")


def imread_gray_u8(fname) -> np.ndarray:
    """Read the luminance plane as HxW uint8.

    Equals ``imread4_u8(fname)[..., 3]`` for grayscale sources; for color
    sources it uses the same BT.601 rounding as OpenCV's BGR2GRAY.
    """
    img = Image.open(fname)
    x = np.array(img)
    if x.ndim == 2:
        return x
    # BT.601 luma in OpenCV's exact fixed-point arithmetic (shift-15
    # coefficients + round-half-up descale, imgproc color_lut.hpp); float
    # rounding differs on ~0.05% of pixels
    r = x[..., 0].astype("int64")
    g = x[..., 1].astype("int64")
    b = x[..., 2].astype("int64")
    y = (9798 * r + 19235 * g + 3735 * b + (1 << 14)) >> 15
    return y.clip(0, 255).astype("uint8")
