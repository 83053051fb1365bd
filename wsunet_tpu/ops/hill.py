"""HILL embedding-cost map (Li et al. 2014), batched.

The reference delegates to ``conseal.hill._costmap.compute_cost``
(src/filters/evaluate.py:102-105) to weight prediction errors by texture.
Re-implemented here from the HILL construction:

    rho = lowpass_15( 1 / lowpass_3( |x (*) H_KB| ) )

with H_KB the 3x3 KB high-pass [[-1,2,-1],[2,-4,2],[-1,2,-1]], both
low-passes plain box averages, and all three "same"-size convolutions using
*symmetric* boundary handling — verified to reproduce the reference wMAE
golden numbers exactly (results/prediction/filters.csv).

Infinities (zero-texture regions) are left in the map; callers clamp to the
reference's wet cost 1e10 (filters/evaluate.py:103).
"""

import numpy as np
import jax.numpy as jnp

from .filters import conv2d_valid

H_KB = np.array(
    [[-1, 2, -1],
     [2, -4, 2],
     [-1, 2, -1]], dtype="float32")


def _conv_same_symmetric(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """[B, H, W] 'same' correlation with symmetric (reflect-with-edge) pad."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw)), mode="symmetric")
    return conv2d_valid(xp, kernel)


def _box_same_symmetric(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Separable size x size box average with symmetric padding: two 1-D
    passes instead of a size^2 conv (the 15x15 low-pass dominates HILL's
    cost otherwise)."""
    p = size // 2
    k = np.full((size,), 1.0 / size, "float32")
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0)), mode="symmetric")
    x = conv2d_valid(xp, k.reshape(size, 1))
    xp = jnp.pad(x, ((0, 0), (0, 0), (p, p)), mode="symmetric")
    return conv2d_valid(xp, k.reshape(1, size))


def hill_cost(x: jnp.ndarray, wet_cost: float = None) -> jnp.ndarray:
    """HILL cost rho for a [B, H, W] (or [H, W]) pixel batch.

    If ``wet_cost`` is given, inf/nan/oversized costs are clamped to it
    (parity: filters/evaluate.py:103 uses 1e10).
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    x = x.astype(jnp.float32)
    r = _conv_same_symmetric(x, H_KB)
    xi = _box_same_symmetric(jnp.abs(r), 3)
    inv = 1.0 / xi  # inf where xi == 0, as in the reference
    rho = _box_same_symmetric(inv, 15)
    if wet_cost is not None:
        bad = jnp.isinf(rho) | jnp.isnan(rho) | (rho > wet_cost)
        rho = jnp.where(bad, wet_cost, rho)
    if squeeze:
        rho = rho[0]
    return rho
