"""OLS-fitted linear pixel predictors.

The reference carries an OLS surface (filters/evaluate.py:129-133 reads
``OLS_*.csv`` kernel estimates; 'OLS' appears in the roc sweeps;
_defs/filters.py:10-33 defines the 9/18/27-tap layouts) but ships no
fitting code.  This module completes it: fit the 8-neighbor taps by least
squares over a cover batch, entirely on device — the normal equations
X^T X theta = X^T y accumulate per image with one conv-like gather, so
fitting a dataset-wide kernel is a single jitted reduction.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .filters import _NEIGHBOR_OFFSETS, taps_to_kernel2d


def _neighborhood_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """[H, W] -> [(H-2)(W-2), 9] ring-ordered neighbors + center
    (reference _defs/filters.py:53-67 layout)."""
    cols = [x[i:i + x.shape[0] - 2, j:j + x.shape[1] - 2].reshape(-1)
            for (i, j) in _NEIGHBOR_OFFSETS]
    cols.append(x[1:-1, 1:-1].reshape(-1))
    return jnp.stack(cols, axis=-1)


@jax.jit
def _accumulate(x: jnp.ndarray):
    """Per-image X^T X [8,8] and X^T y [8] sums over a [B, H, W] batch."""
    def one(img):
        m = _neighborhood_matrix(img)
        X, y = m[:, :8], m[:, 8]
        return X.T @ X, X.T @ y

    xtx, xty = jax.vmap(one)(x)
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
