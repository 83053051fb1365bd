"""Stego embedding simulators (LSBr / HILLr).

Fixture semantics verified directly against the reference data
(SURVEY.md §0, re-measured here):

- both simulators use LSB-*replacement* direction (even pixels +1, odd -1,
  i.e. x ^ 1 on changed pixels) and change rate beta = alpha / 2;
- LSBr embeds i.i.d.: each pixel is overwritten with a random message bit
  with probability alpha, so it changes with probability alpha/2
  (measured 49.95% at alpha=1.0 — random, not exact-count);
- HILLr is cost-adaptive: exactly round(alpha/2 * N) pixels with the
  LOWEST HILL cost get their LSB flipped (measured: the changed set is
  precisely the bottom alpha/2 cost quantile, change rate exactly
  alpha/2).

The JAX versions run on device, so cover->stego training pairs are
generated on-TPU from a cover batch (no host round-trip, a capability the
reference lacks — it ships pre-embedded fixtures only).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.hill import hill_cost
from ..utils.seeding import filename_to_image_seed


def lsbr_simulate(x_u8: jnp.ndarray, alpha, key) -> jnp.ndarray:
    """LSBr embedding on a uint8 batch [B, H, W].

    ``alpha`` is a scalar or per-image [B] embedding rate.
    """
    alpha = jnp.asarray(alpha, jnp.float32)
    if alpha.ndim == 0:
        alpha = jnp.broadcast_to(alpha, (x_u8.shape[0],))
    k1, k2 = jax.random.split(key)
    embed = jax.random.uniform(k1, x_u8.shape) < alpha[:, None, None]
    bits = jax.random.bernoulli(k2, 0.5, x_u8.shape)
    x = x_u8.astype(jnp.uint8)
    replaced = jnp.bitwise_or(
        jnp.bitwise_and(x, jnp.uint8(0xFE)), bits.astype(jnp.uint8))
    return jnp.where(embed, replaced, x)


def hillr_simulate(x_u8: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """HILLr embedding on a uint8 batch [B, H, W]: flip the LSB of the
    round(alpha/2 * N) lowest-HILL-cost pixels (deterministic)."""
    B, H, W = x_u8.shape
    n_changes = int(round(alpha / 2.0 * H * W))
    rho = hill_cost(x_u8.astype(jnp.float32), wet_cost=1e10)
    flat = rho.reshape(B, -1)
    # threshold = n_changes-th smallest cost per image
    kth = jax.lax.top_k(-flat, n_changes)[0][:, -1]  # -(cost threshold)
    thresh = -kth[:, None]
    # every strictly-cheaper pixel flips; ties AT the threshold are resolved
    # deterministically in row-major order until exactly n_changes flips
    # (cutting the cumsum over the whole selected set instead would let an
    # early tied pixel evict a later strictly-cheaper one)
    below = flat < thresh
    tied = flat == thresh
    remaining = n_changes - jnp.sum(below, axis=1, keepdims=True)
    tie_order = jnp.cumsum(tied, axis=1)
    flip = (below | (tied & (tie_order <= remaining))).reshape(B, H, W)
    x = x_u8.astype(jnp.uint8)
    return jnp.where(flip, jnp.bitwise_xor(x, jnp.uint8(1)), x)


def simulate(x_u8, stego_method: str, alpha, key=None):
    """Dispatch by stego method name (LSBR / HILLR, case-insensitive)."""
    method = stego_method.upper().rstrip("R") + "R"
    if method == "LSBR":
        if key is None:
            raise ValueError("LSBr simulation requires a PRNG key")
        return lsbr_simulate(x_u8, alpha, key)
    if method == "HILLR":
        return hillr_simulate(x_u8, float(alpha))
    raise NotImplementedError(stego_method)


def image_key(filename: str, salt: int = 0) -> jax.Array:
    """Deterministic per-image PRNG key from the filename stem (parity with
    the reference's filename_to_image_seed convention, fabrika.py:276-291)."""
    return jax.random.PRNGKey(filename_to_image_seed(filename) + salt)
