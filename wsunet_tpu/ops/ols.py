"""OLS-fitted linear pixel predictors (gray / color4 / color8 layouts).

The reference carries an OLS surface (filters/evaluate.py:129-133 reads
``OLS_*.csv`` kernel estimates; 'OLS' appears in the roc sweeps;
_defs/filters.py:10-33 defines the 9/18/27-tap layouts gray/color4/color8)
but ships no fitting code.  This module completes it: fit the taps by
least squares over a cover batch, entirely on device — the normal
equations X^T X theta = X^T y accumulate per image with one conv-like
gather, so fitting a dataset-wide kernel is a single jitted reduction.

Tap layouts (reference _defs/filters.py BETAS_PER_MODEL):
- gray:   8 regressors — the ring neighbors of the target channel
- color4: 17 — 9 taps (incl. center) of one helper channel + 8 of target
- color8: 26 — 9 + 9 helper taps + 8 of target
The target center (x11) is always the regressand, never a regressor.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .filters import _NEIGHBOR_OFFSETS, conv2d_valid, taps_to_kernel2d


def _neighborhood_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """[H, W] -> [(H-2)(W-2), 9] ring-ordered neighbors + center
    (reference _defs/filters.py:53-67 layout)."""
    cols = [x[i:i + x.shape[0] - 2, j:j + x.shape[1] - 2].reshape(-1)
            for (i, j) in _NEIGHBOR_OFFSETS]
    cols.append(x[1:-1, 1:-1].reshape(-1))
    return jnp.stack(cols, axis=-1)


def _design(img):
    """Regressor matrix + target for one image.

    ``img`` is [H, W] (gray) or [H, W, C] with helpers first and the
    target channel LAST; helper channels contribute all 9 taps, the
    target contributes its 8 ring neighbors."""
    if img.ndim == 2:
        m = _neighborhood_matrix(img)
        return m[:, :8], m[:, 8]
    cols = [_neighborhood_matrix(img[..., c])
            for c in range(img.shape[-1] - 1)]
    m_t = _neighborhood_matrix(img[..., -1])
    return jnp.concatenate(cols + [m_t[:, :8]], axis=-1), m_t[:, 8]


def _accumulate(x: jnp.ndarray):
    """Per-image X^T X and X^T y sums over a [B, ...] batch."""
    def one(img):
        X, y = _design(img)
        return X.T @ X, X.T @ y

    xtx, xty = jax.jit(jax.vmap(one))(x)
    return xtx.sum(0), xty.sum(0)


def fit_ols(pixels: np.ndarray) -> np.ndarray:
    """Fit the 8 neighbor taps over a cover batch [B, H, W] (f32 0..255).

    Returns the taps in ring order (compatible with NAMED_FILTERS /
    taps_to_kernel2d)."""
    xtx, xty = _accumulate(jnp.asarray(pixels, jnp.float32))
    theta = np.linalg.solve(np.asarray(xtx, np.float64),
                            np.asarray(xty, np.float64))
    return theta.reshape(8, 1)


def ols_kernel2d(pixels: np.ndarray) -> np.ndarray:
    """Fitted taps as a 3x3 kernel usable by filter_predict / ws_attack."""
    return taps_to_kernel2d(fit_ols(pixels))


def fit_ols_color(pixels: np.ndarray, channels) -> np.ndarray:
    """Fit a color4/color8 layout over a cover batch [B, H, W, C].

    ``channels`` orders the contributing planes of the C-channel input:
    helpers first, the predicted (target) channel last — e.g. (1, 0) fits
    color4 "predict R from G's 9 taps + R's 8 neighbors".  Returns the
    flat tap vector (9 per helper, then 8 target taps)."""
    channels = tuple(channels)
    if len(channels) not in (2, 3):
        raise ValueError("color OLS takes 2 (color4) or 3 (color8) channels")
    x = jnp.asarray(pixels, jnp.float32)[..., list(channels)]
    xtx, xty = _accumulate(x)
    theta = np.linalg.solve(np.asarray(xtx, np.float64),
                            np.asarray(xty, np.float64))
    return theta


def ols_color_kernels(pixels: np.ndarray, channels) -> dict:
    """Fitted color taps as per-input-channel 3x3 kernels.

    Returns {channel: kernel} where prediction(target) =
    sum_c correlate_valid(x[..., c], kernel[c])."""
    channels = tuple(channels)
    theta = fit_ols_color(pixels, channels)
    kernels = {}
    for i, c in enumerate(channels[:-1]):
        kernels[c] = taps_to_kernel2d(theta[9 * i: 9 * (i + 1)])
    kernels[channels[-1]] = taps_to_kernel2d(theta[9 * (len(channels) - 1):])
    return kernels


def ols_color_predict(x4: jnp.ndarray, kernels: dict) -> jnp.ndarray:
    """[B, H, W, C] f32 -> [B, H-2, W-2] target-channel prediction."""
    out = None
    for c, k in kernels.items():
        p = conv2d_valid(x4[..., c], jnp.asarray(k))
        out = p if out is None else out + p
    return out
