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


def l1_loss(outputs, covers, *_, **__):
    return jnp.mean(jnp.abs(covers - outputs))


def l2_loss(outputs, covers, *_, **__):
    return jnp.mean((covers - outputs) ** 2)


def ws_loss(outputs, covers, inputs, alphas):
    betas = alphas / 2.0
    betas_hat = ws_estimate_inloss(inputs, outputs)
    return jnp.mean(jnp.abs(betas_hat - betas))


def l1ws_loss(outputs, covers, inputs, alphas):
    return l1_loss(outputs, covers) + ws_loss(outputs, covers, inputs, alphas)


_LOSSES = {
    "l1": l1_loss,
    "l2": l2_loss,
    "ws": ws_loss,
    "l1ws": l1ws_loss,
}


def get_loss(name: str):
    try:
        return _LOSSES[name]
    except KeyError:
        raise NotImplementedError(f"loss {name!r} not implemented") from None
