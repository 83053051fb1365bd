"""Border-corrected SAME conv == reflect-pad conv (exact, all layers)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wsunet_tpu.ops.reflect_conv import conv3x3_reflect_borderfix
from wsunet_tpu.experiments.pallas_reflect_conv import _reference


@pytest.mark.parametrize("shape,cout", [
    ((2, 16, 16, 3), 5),
    ((1, 32, 24, 1), 8),   # C=1: the layer class the Pallas kernel can't do
    ((2, 8, 40, 4), 4),
])
@pytest.mark.parametrize("relu", [False, True])
def test_borderfix_matches_reflect_reference(shape, cout, relu):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype("f"))
    w = jnp.asarray(rng.normal(size=(3, 3, shape[-1], cout)).astype("f"))
    b = jnp.asarray(rng.normal(size=(cout,)).astype("f"))
    got = np.asarray(conv3x3_reflect_borderfix(x, w, b, relu=relu))
    want = np.asarray(_reference(x, w, b, relu=relu))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-5)


def test_borderfix_unet_matches_plain():
    from wsunet_tpu.models import get_model
    x = jnp.asarray(np.random.default_rng(1).uniform(
        size=(1, 64, 64, 1)), jnp.float32)
    m = get_model("unet_2")
    v = m.init(jax.random.PRNGKey(0), x)
    slow = m.apply(v, x)
    fast = get_model("unet_2", fast_conv="borderfix").apply(v, x)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=1e-5, atol=1e-5)


def test_borderfix_grad_matches():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype("f"))
    w = jnp.asarray(rng.normal(size=(3, 3, 2, 3)).astype("f"))
    b = jnp.asarray(rng.normal(size=(3,)).astype("f"))
    g_fast = jax.grad(lambda *a: jnp.sum(
        conv3x3_reflect_borderfix(*a) ** 2), argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(lambda *a: jnp.sum(
        _reference(*a) ** 2), argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-4)
