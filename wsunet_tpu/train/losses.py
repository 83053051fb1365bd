"""Training losses as pure functions.

Parity: reference src/_defs/losses.py —
- l1 / l2 against the cover (losses.py:28-42)
- ws: in-graph WS estimator, |beta_hat - beta| with beta = alpha/2
  (losses.py:45-89)
- l1ws: unweighted sum of the two (losses.py:93-121; the config's
  ``loss_lambda`` is recorded but the live code sums unweighted).

All operate on NHWC tensors in [0, 1]: ``outputs`` is the model
prediction, ``covers`` the cover target, ``inputs`` the (possibly stego)
model input, ``alphas`` the per-image embedding rate [B].
"""

import jax.numpy as jnp

from ..ops.ws import ws_estimate_inloss


def _image_axes(x):
    return tuple(range(1, x.ndim))


def l1_loss_per_image(outputs, covers, *_, **__):
    return jnp.mean(jnp.abs(covers - outputs), axis=_image_axes(outputs))


def l2_loss_per_image(outputs, covers, *_, **__):
    return jnp.mean((covers - outputs) ** 2, axis=_image_axes(outputs))


def ws_loss_per_image(outputs, covers, inputs, alphas):
    betas = alphas / 2.0
    betas_hat = ws_estimate_inloss(inputs, outputs)
    return jnp.abs(betas_hat - betas)


def l1ws_loss_per_image(outputs, covers, inputs, alphas):
    return (l1_loss_per_image(outputs, covers)
            + ws_loss_per_image(outputs, covers, inputs, alphas))


def make_l1ws_weighted_per_image(loss_lambda: float):
    """The reference anchor's lambda-weighted composite:
    ``2 * (lambda * L1 + (1 - lambda) * WS)``.

    The reference's *live* L1WSLoss sums unweighted (losses.py:114-115)
    but its shipped UNet checkpoints were trained in the authors'
    private repo with ``loss_lambda=0.25`` recorded in every config and
    encoded in the run names (models/unet/LSBR/240222160214-*/
    config.json, run suffix ``l1ws_0.25``); the weighted form survives
    as the commented line ``((self.lmbda) * prediction_mae +
    (1-self.lmbda) * ws_mae)*2`` (losses.py:117).  lambda=0.25 weights
    the WS objective 3x over L1 — the WS statistic is what the detector
    thresholds, so this is the recipe lever for the detection rows."""

    def loss(outputs, covers, inputs, alphas):
        return 2.0 * (
            loss_lambda * l1_loss_per_image(outputs, covers)
            + (1.0 - loss_lambda)
            * ws_loss_per_image(outputs, covers, inputs, alphas))

    return loss


_PER_IMAGE = {
    "l1": l1_loss_per_image,
    "l2": l2_loss_per_image,
    "ws": ws_loss_per_image,
    "l1ws": l1ws_loss_per_image,
}


def _scalarize(fn):
    def loss(outputs, covers, inputs=None, alphas=None):
        return jnp.mean(fn(outputs, covers, inputs, alphas))
    return loss


def l1_loss(outputs, covers, *_, **__):
    return jnp.mean(jnp.abs(covers - outputs))


def l2_loss(outputs, covers, *_, **__):
    return jnp.mean((covers - outputs) ** 2)


def ws_loss(outputs, covers, inputs, alphas):
    return jnp.mean(ws_loss_per_image(outputs, covers, inputs, alphas))


def l1ws_loss(outputs, covers, inputs, alphas):
    return l1_loss(outputs, covers) + ws_loss(outputs, covers, inputs, alphas)


_LOSSES = {
    "l1": l1_loss,
    "l2": l2_loss,
    "ws": ws_loss,
    "l1ws": l1ws_loss,
}


def get_loss(name: str, per_image: bool = False,
             loss_lambda: float = None):
    """Loss by name; ``per_image=True`` returns the unreduced [B] variant so
    trainers can mask padded/failed-decode rows out of the mean (the scalar
    variants are the reference-parity batch means, _defs/losses.py:28-121).

    ``loss_lambda`` (only meaningful for ``l1ws``) switches to the
    reference anchor's weighted composite ``2*(lambda*L1 + (1-lambda)*WS)``
    (see make_l1ws_weighted_per_image); ``None`` keeps the reference's
    live unweighted sum, so existing runs/tests are untouched."""
    if name == "l1ws" and loss_lambda is not None:
        fn = make_l1ws_weighted_per_image(float(loss_lambda))
        return fn if per_image else _scalarize(fn)
    table = _PER_IMAGE if per_image else _LOSSES
    try:
        return table[name]
    except KeyError:
        raise NotImplementedError(f"loss {name!r} not implemented") from None
