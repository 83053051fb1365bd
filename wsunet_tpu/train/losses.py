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


def get_loss(name: str, per_image: bool = False):
    """Loss by name; ``per_image=True`` returns the unreduced [B] variant so
    trainers can mask padded/failed-decode rows out of the mean (the scalar
    variants are the reference-parity batch means, _defs/losses.py:28-121)."""
    table = _PER_IMAGE if per_image else _LOSSES
    try:
        return table[name]
    except KeyError:
        raise NotImplementedError(f"loss {name!r} not implemented") from None
