"""Weighted-stego (WS) change-rate estimation, batched and fused.

The reference implements three slightly different WS variants (SURVEY.md §7
"bit-comparability"); each has a dedicated function here:

- ``ws_attack``          — src/ws/estimate.py:55-136: uint8-domain LSB flip,
  Sum with uniform-1/N or (inverse-)variance weights, clip at 0, optional
  bias correction.
- ``ws_estimate_unet``   — src/unet/evaluate.py:125-133: mean instead of
  weighted sum, NO clipping (cover estimates may be negative), 1-px border
  crop applied to x before the product.
- ``ws_estimate_inloss`` — src/_defs/losses.py:45-89: in-graph variant for
  training: inputs in [0,1], round-then-XOR, relu.

Everything is jit-safe, operates on [B, H, W] batches, and keeps the whole
cover/stego stream HBM-resident: uint8 in, one scalar per image out.
"""

import typing

import numpy as np
import jax.numpy as jnp

from .filters import NAMED_FILTERS_2D, conv2d_valid, filter_predict


def lsb_flip_u8(x_u8: jnp.ndarray) -> jnp.ndarray:
    """x ^ 1 in the uint8 domain (parity: ws/estimate.py:83)."""
    return jnp.bitwise_xor(x_u8.astype(jnp.uint8), jnp.uint8(1))


def ws_weights(
    x: jnp.ndarray,
    weighted: int,
    mean_kernel=None,
) -> jnp.ndarray:
    """Per-pixel weights over the VALID interior, [B, H-2, W-2].

    weighted == 0 : uniform 1/N
    weighted == 1 : 1 / (5 + local variance), normalized per image
    weighted == -1: (5 + local variance), normalized per image
    Parity: ws/estimate.py:92-110 (local mean/var via AVG valid convs).
    """
    B, H, W = x.shape
    n = (H - 2) * (W - 2)
    if weighted == 0:
        return jnp.full((B, H - 2, W - 2), 1.0 / n, dtype=x.dtype)
    if mean_kernel is None:
        mean_kernel = NAMED_FILTERS_2D["AVG"]
    k = np.asarray(mean_kernel, dtype="float32")[::-1, ::-1]
    mu = conv2d_valid(x, k)
    mu2 = conv2d_valid(x * x, k)
    var = mu2 - mu * mu
    w = 1.0 / (5.0 + var) if int(weighted) == 1 else (5.0 + var)
    return w / jnp.sum(w, axis=(1, 2), keepdims=True)


def ws_attack(
    x_u8: jnp.ndarray,
    pixel_kernel=None,
    pixel_estimator: typing.Callable = None,
    mean_kernel=None,
    weighted: int = 0,
    correct_bias: bool = False,
) -> jnp.ndarray:
    """WS attack on a uint8 batch [B, H, W] -> beta_hat [B].

    Parity: src/ws/estimate.py:55-136.  The pixel predictor is either a 3x3
    kernel (KB/AVG path, fused into this graph) or a callable
    ``f32 [B,H,W] -> [B,H-2,W-2]`` (the U-Net path).
    """
    x = x_u8.astype(jnp.float32)
    x_bar = lsb_flip_u8(x_u8).astype(jnp.float32)

    if pixel_estimator is None:
        pixel_estimator = lambda v: filter_predict(v, pixel_kernel)
    x_hat = pixel_estimator(x)

    w = ws_weights(x, weighted, mean_kernel)

    x1 = x[:, 1:-1, 1:-1]
    x1_bar = x_bar[:, 1:-1, 1:-1]
    beta_hat = jnp.sum(w * (x1 - x1_bar) * (x1 - x_hat), axis=(1, 2))
    beta_hat = jnp.clip(beta_hat, 0.0, None)

    if correct_bias:
        x_bias = pixel_estimator(x_bar - x)
        beta_hat = beta_hat - beta_hat * jnp.sum(
            w * (x1 - x1_bar) * x_bias, axis=(1, 2))
    return beta_hat


def ws_attack_sca(
    x_u8: jnp.ndarray,
    pixel_kernel=None,
    pixel_estimator: typing.Callable = None,
    frac: float = 0.05,
) -> jnp.ndarray:
    """Selection-channel-aware WS detector for cost-adaptive LSB
    embedding (HILLr), [B, H, W] uint8 -> score [B].

    Cost-adaptive embedders flip ONLY the lowest-HILL-cost pixels
    (data/simulate.hillr_simulate measures the reference/conseal
    semantics: exactly the round(alpha/2*N) cheapest pixels change), and
    the attacker can recompute that cost map from the image under test —
    the classic "selection channel" (Li et al. 2014 costs; cf. the
    selection-channel-aware attacks of Denemark et al.).  The score is
    the plain WS change-rate estimate RESTRICTED to the lowest-``frac``
    cost fraction of the valid interior:

        score = mean_{rho_i <= Q_frac(rho)} (x_i - xbar_i)(x_i - xhat_i)

    For HILLr at change rate alpha/2 <= frac every flip lands inside the
    region, so the score estimates (alpha/2)/frac — a 1/frac
    amplification over the global WS estimate — while for covers it
    concentrates around 0.  Unclipped (cover scores may go negative,
    like ws_estimate_unet): this is a detector score, not a rate
    estimate.  ``frac`` defaults to 0.05 = the largest alpha/2 on the
    evaluated grid (alpha in {.01,.05,.1}, the golden detection table's
    rates) so the region covers all flips at every evaluated rate.

    PRE-COMMITMENT (leak-free protocol, docs/EVAL_PROTOCOL.md): the
    statistic and frac=0.05 were chosen on non-fixture tuning images
    (matplotlib sample data + synthetic sensor-like textures,
    tests/test_sca_ws.py reproduces the mechanism check) BEFORE any
    fixture score of this detector existed.

    No reference counterpart: the reference's WS sweep
    (src/ws/estimate.py) is selection-blind; this row is a framework
    addition targeting the HILLR gap its detection table never covers.
    """
    x = x_u8.astype(jnp.float32)
    x_bar = lsb_flip_u8(x_u8).astype(jnp.float32)
    if pixel_estimator is None:
        pixel_estimator = lambda v: filter_predict(v, pixel_kernel)
    x_hat = pixel_estimator(x)
    x1 = x[:, 1:-1, 1:-1]
    x1_bar = x_bar[:, 1:-1, 1:-1]
    s = (x1 - x1_bar) * (x1 - x_hat)

    from .hill import hill_cost
    rho = hill_cost(x, wet_cost=1e10)[:, 1:-1, 1:-1]
    B = x.shape[0]
    thresh = jnp.quantile(rho.reshape(B, -1), frac, axis=1)[:, None, None]
    # <= keeps the threshold pixel itself; on a wet/flat plateau (ties at
    # the quantile) the region grows past frac and the score degrades
    # toward the global WS mean — defined and deterministic either way
    low = rho <= thresh
    return (jnp.sum(jnp.where(low, s, 0.0), axis=(1, 2))
            / jnp.sum(low, axis=(1, 2)))


def ws_estimate_unet(
    x: jnp.ndarray,
    x_hat: jnp.ndarray,
) -> typing.Tuple[jnp.ndarray, jnp.ndarray]:
    """(beta_hat, l1) per image for a U-Net prediction.

    Parity: src/unet/evaluate.py:109-139 — x is the f32 luminance [B, H, W],
    x_hat the model output cropped to [B, H-2, W-2]; the LSB flip happens on
    x cast to uint8; the mean is unweighted and unclipped.
    """
    x1 = x[:, 1:-1, 1:-1]
    x1_bar = jnp.bitwise_xor(x1.astype(jnp.uint8), jnp.uint8(1)).astype(jnp.float32)
    beta_hat = jnp.mean((x1 - x1_bar) * (x1 - x_hat), axis=(1, 2))
    l1 = jnp.mean(jnp.abs(x1 - x_hat), axis=(1, 2))
    return beta_hat, l1


def ws_estimate_inloss(inputs: jnp.ndarray, outputs: jnp.ndarray) -> jnp.ndarray:
    """In-graph WS estimate for training losses, [B, H, W, C] in [0, 1].

    Parity: src/_defs/losses.py:45-63 — x255, round-then-XOR, uniform
    weights 1/(pixels per image), per-image sum, relu.  Differentiable wrt
    ``outputs`` (the flip path through round/xor carries no gradient in the
    reference either: torch `.int()` detaches it).
    """
    x = inputs * 255.0
    y = outputs * 255.0
    x_bar = jnp.bitwise_xor(
        jnp.round(x).astype(jnp.int32), 1).astype(jnp.float32)
    x_bar = jax_stop_gradient(x_bar)
    n = x.shape[1] * x.shape[2] * (x.shape[3] if x.ndim == 4 else 1)
    axes = tuple(range(1, x.ndim))
    beta_hat = jnp.sum((x - x_bar) * (x - y), axis=axes) / n
    return jnp.maximum(beta_hat, 0.0)


def jax_stop_gradient(x):
    import jax
    return jax.lax.stop_gradient(x)
