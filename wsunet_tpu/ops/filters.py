"""Linear pixel-prediction filters, batched for TPU.

Parity targets:
- kernels: reference src/filters/evaluate.py:22-50 and src/ws/estimate.py:31-52
  (KB / AVG / AVG9 / identity, as 9-tap 1-D and 3x3 2-D variants)
- prediction: src/filters/evaluate.py:136-141 — scipy
  ``convolve(x/255, k[::-1], 'valid') * 255``.  scipy's *convolution* flips
  the kernel spatially; we express it as an XLA correlation with a
  pre-flipped kernel so arbitrary (asymmetric) kernels also match.
- residuals: src/filters/evaluate.py:53-76 — ``y - X @ filter`` on the
  flattened 8-neighborhood of raw (unscaled) pixels.  Rewritten here as a
  single fused 3x3 valid convolution with kernel ``center - neighbors``;
  mathematically identical, but batched and MXU/VPU-friendly instead of
  building an Nx9 matrix per image.

All functions take [B, H, W] or [H, W] float32 arrays and are jit-safe.
"""

import numpy as np
import jax
import jax.numpy as jnp

# 3x3 kernels, written in row-major orientation (no transpose games: the
# reference stores them transposed and then flips inside scipy convolve;
# all four are symmetric so orientation is irrelevant for them, but we keep
# true-convolution semantics in filter_predict for generality).
NAMED_FILTERS_2D = {
    "KB": np.array(
        [[-1, +2, -1],
         [+2, 0, +2],
         [-1, +2, -1]], dtype="float32") / 4.0,
    "AVG": np.array(
        [[1, 1, 1],
         [1, 0, 1],
         [1, 1, 1]], dtype="float32") / 8.0,
    "AVG9": np.ones((3, 3), dtype="float32") / 9.0,
    "1": np.array(
        [[0, 0, 0],
         [0, 1, 0],
         [0, 0, 0]], dtype="float32"),
}

# 9-tap neighborhood order used by the reference's N x 9 matrices:
# x00,x01,x02,x12,x22,x21,x20,x10 (clockwise ring), then x11 (center).
_NEIGHBOR_OFFSETS = [
    (0, 0), (0, 1), (0, 2), (1, 2), (2, 2), (2, 1), (2, 0), (1, 0),
]

NAMED_FILTERS = {
    "KB": np.array([[-1], [+2], [-1], [+2], [-1], [+2], [-1], [+2]],
                   dtype="float64") / 4.0,
    "AVG": np.ones((8, 1), dtype="float64") / 8.0,
    # 9-tap variants carry an explicit center coefficient (last entry)
    "AVG9": np.ones((9, 1), dtype="float64") / 9.0,
    "1": np.array([[0]] * 8 + [[1]], dtype="float64"),
}


def get_coefficients(filter_name: str, flatten: bool = True) -> np.ndarray:
    """Named filter lookup (parity: filters/evaluate.py:118-126)."""
    return NAMED_FILTERS[filter_name] if flatten else NAMED_FILTERS_2D[filter_name]


def taps_to_kernel2d(taps: np.ndarray, center: float = 0.0) -> np.ndarray:
    """Convert a 9-tap (8 neighbors [+ optional center]) vector into a 3x3
    kernel in spatial orientation."""
    taps = np.asarray(taps).reshape(-1)
    k = np.zeros((3, 3), dtype="float32")
    for coef, (i, j) in zip(taps[:8], _NEIGHBOR_OFFSETS):
        k[i, j] = coef
    k[1, 1] = taps[8] if taps.size > 8 else center
    return k


def conv2d_valid(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Batched VALID *correlation* of [B, H, W] with a 2-D kernel.

    The MXU/VPU-friendly primitive underlying every filter op.  Callers
    wanting true convolution must pre-flip the kernel.

    Precision is pinned to HIGHEST: on TPU the default conv precision
    decomposes f32 into bf16 passes, which breaks bit-comparability of the
    WS estimates with the golden CSVs (beta_hat is a ~1e-3-scale residual
    statistic).  A 3x3 single-channel conv is bandwidth-bound anyway, so
    full f32 costs nothing here.
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    lhs = x[:, None, :, :]  # NCHW
    rhs = jnp.asarray(kernel, x.dtype)[None, None, :, :]  # OIHW
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0]
    return out[0] if squeeze else out


def filter_predict(x: jnp.ndarray, kernel) -> jnp.ndarray:
    """Predict each interior pixel from its 3x3 neighborhood.

    Parity: filters/evaluate.py:136-141 — scale to [0,1], true convolution
    VALID, scale back.  [B, H, W] -> [B, H-2, W-2].
    """
    k = np.asarray(kernel, dtype="float32")
    k_flipped = k[::-1, ::-1]  # convolution == correlation with flipped kernel
    return conv2d_valid(x / 255.0, k_flipped) * 255.0


def filter_residuals(x: jnp.ndarray, kernel2d) -> jnp.ndarray:
    """Residual ``center - prediction`` on raw pixel values.

    Parity: filters/evaluate.py:53-76 (the N x 9 matmul path, which works on
    unscaled pixels and a float64 tap vector).  Fused into one valid conv
    with kernel (delta_center - taps); float32 on device.
    [B, H, W] -> [B, H-2, W-2].
    """
    k = np.asarray(kernel2d, dtype="float32")
    resid_kernel = -k.copy()
    resid_kernel[1, 1] += 1.0
    # residual = x_center - correlate(x, k) ; taps are symmetric-orientation
    # free for named filters, and taps_to_kernel2d already spatializes 1-D
    # tap vectors, so a plain correlation is the exact contraction.
    return conv2d_valid(x, resid_kernel)
