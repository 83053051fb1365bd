"""Stego simulators vs measured fixture semantics (SURVEY.md §0)."""

import numpy as np

import jax
import jax.numpy as jnp

from wsunet_tpu.data.simulate import hillr_simulate, lsbr_simulate
from wsunet_tpu.io import imread_gray_u8
from wsunet_tpu.ops import hill_cost


def test_lsbr_change_rate_and_direction(data_root):
    x = imread_gray_u8(data_root / "images" / "6.png")
    for alpha in [0.4, 1.0]:
        s = np.asarray(lsbr_simulate(
            jnp.asarray(x[None]), alpha, jax.random.PRNGKey(0)))[0].astype(int)
        d = s - x.astype(int)
        assert set(np.unique(d)) <= {-1, 0, 1}
        np.testing.assert_allclose((d != 0).mean(), alpha / 2, atol=0.01)
        # LSB-replacement direction: even pixels only +1, odd only -1
        assert (d[x % 2 == 0] >= 0).all()
        assert (d[x % 2 == 1] <= 0).all()


def test_hillr_changes_lowest_cost_pixels(data_root):
    x = imread_gray_u8(data_root / "images" / "6.png")
    alpha = 0.4
    s = np.asarray(hillr_simulate(jnp.asarray(x[None]), alpha))[0].astype(int)
    d = s - x.astype(int)
    n_changed = (d != 0).sum()
    assert n_changed == round(alpha / 2 * x.size)
    # all changes are LSB flips
    assert (np.abs(d) <= 1).all()
    assert ((s ^ x.astype(int)) * (d != 0) <= 1).all()
    # changed set is exactly the lowest-cost quantile (up to ties)
    rho = np.asarray(hill_cost(jnp.asarray(x, jnp.float32), wet_cost=1e10))
    thresh = np.sort(rho.flatten())[n_changed - 1]
    assert rho[d != 0].max() <= thresh + 1e-6


def test_hillr_matches_fixture_change_set(data_root):
    """Our HILLr selects (nearly) the same pixel set as the reference
    fixture generator at alpha=0.4 (ties at the threshold may differ)."""
    from PIL import Image

    x = imread_gray_u8(data_root / "images" / "6.png")
    ref_s = np.array(Image.open(
        data_root / "stego_HILLr_alpha_0.4_independent_images" / "6.png")).astype(int)
    ref_changed = ref_s != x.astype(int)
    s = np.asarray(hillr_simulate(jnp.asarray(x[None]), 0.4))[0].astype(int)
    our_changed = s != x.astype(int)
    overlap = (ref_changed & our_changed).sum() / ref_changed.sum()
    assert overlap > 0.99, overlap
