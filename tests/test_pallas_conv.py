"""Retired fused reflect-conv Pallas kernel: interpret-mode numerics + VJP.

The kernel was retired from the shipping surface in round 4 (the XLA
borderfix conv runs at 97.6% of the pad-free ceiling) but stays archived
in experiments/pallas_reflect_conv.py with this suite and the TPU-gated
parity test in tests/test_tpu_pallas_parity.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wsunet_tpu.experiments.pallas_reflect_conv import (
    _TH, _forward, _reference, conv3x3_reflect_fused)


@pytest.mark.parametrize("shape,cout", [
    ((2, 32, 40, 3), 8),
    ((1, 48, 16, 1), 4),
])
def test_interpret_matches_reference(shape, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype("float32"))
    w = jnp.asarray(rng.normal(size=(3, 3, shape[-1], cout)).astype("f"))
    b = jnp.asarray(rng.normal(size=(cout,)).astype("float32"))
    got = _forward(x, w, b, interpret=True)
    want = _reference(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tile_multiple_heights():
    """Edge tiles (first/last) and interior tiles all handled."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4 * _TH, 24, 2)).astype("f"))
    w = jnp.asarray(rng.normal(size=(3, 3, 2, 4)).astype("f"))
    b = jnp.zeros((4,), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(_forward(x, w, b, interpret=True)),
        np.asarray(_reference(x, w, b)), rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_reference_grad():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype("f"))
    w = jnp.asarray(rng.normal(size=(3, 3, 2, 3)).astype("f"))
    b = jnp.asarray(rng.normal(size=(3,)).astype("f"))

    # off-TPU the primal falls back to _reference, so the VJP pair is
    # checked end-to-end through the public entry point
    def loss_fast(x, w, b):
        return jnp.sum(conv3x3_reflect_fused(x, w, b) ** 2)

    def loss_ref(x, w, b):
        return jnp.sum(_reference(x, w, b) ** 2)

    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("relu", [False, True])
def test_interpret_relu_fusion(relu):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 32, 24, 3)).astype("f"))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8)).astype("f"))
    b = jnp.asarray(rng.normal(size=(8,)).astype("f"))
    got = _forward(x, w, b, relu=relu, interpret=True)
    want = _reference(x, w, b, relu=relu)
    if relu:
        assert float(jnp.min(got)) >= 0.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_relu_matches_reference_grad():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype("f"))
    w = jnp.asarray(rng.normal(size=(3, 3, 2, 3)).astype("f"))
    b = jnp.asarray(rng.normal(size=(3,)).astype("f"))
    g_fast = jax.grad(lambda *a: jnp.sum(
        conv3x3_reflect_fused(*a, relu=True) ** 2), argnums=(0, 1, 2))(
        x, w, b)
    g_ref = jax.grad(lambda *a: jnp.sum(
        _reference(*a, relu=True) ** 2), argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-5)
