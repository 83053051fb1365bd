"""WS estimator vs numpy oracle and fixture semantics."""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from wsunet_tpu.io import imread_gray_u8
from wsunet_tpu.ops import NAMED_FILTERS_2D, ws_attack, ws_estimate_unet
from wsunet_tpu.ops.ws import ws_weights


def _numpy_ws_attack(x_u8, kernel, weighted=0, correct_bias=False):
    """Oracle transliteration of ws/estimate.py:55-136 (single image)."""
    x = x_u8.astype("float32")[..., None]
    x_bar = (x_u8 ^ 1).astype("float32")[..., None]
    k_ref = kernel.T[..., None]  # reference storage orientation

    def estimator(v):
        return scipy.signal.convolve(
            v / 255.0, k_ref[..., ::-1], mode="valid")[..., :1] * 255.0

    x1_hat = estimator(x)
    avg = NAMED_FILTERS_2D["AVG"].T[..., None]
    if abs(int(weighted)) == 1:
        mu = scipy.signal.convolve(x[..., :1], avg[..., ::-1], mode="valid")
        mu2 = scipy.signal.convolve(x[..., :1] ** 2, avg[..., ::-1], mode="valid")
        var = mu2 - mu ** 2
        w = 1 / (5 + var) if int(weighted) == 1 else 5 + var
        w = w / np.sum(w)
    else:
        w = np.ones_like(x1_hat) / x1_hat.size
    x1 = x[1:-1, 1:-1, :1]
    x1_bar = x_bar[1:-1, 1:-1, :1]
    beta = np.clip(np.sum(w * (x1 - x1_bar) * (x1 - x1_hat)), 0, None)
    if correct_bias:
        x_bias = estimator(x_bar - x)
        beta -= beta * np.sum(w * (x1 - x1_bar) * x_bias)
    return beta


@pytest.mark.parametrize("weighted", [0, 1, -1])
@pytest.mark.parametrize("name", ["KB", "AVG"])
def test_ws_attack_matches_oracle(name, weighted, data_root):
    x = imread_gray_u8(data_root / "images" / "7.png")
    want = _numpy_ws_attack(x, NAMED_FILTERS_2D[name], weighted=weighted)
    got = np.asarray(ws_attack(
        jnp.asarray(x[None]), pixel_kernel=NAMED_FILTERS_2D[name],
        weighted=weighted))[0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-6)


def test_ws_attack_bias_correction_matches_oracle(data_root):
    x = imread_gray_u8(data_root / "images" / "8.png")
    want = _numpy_ws_attack(x, NAMED_FILTERS_2D["KB"], correct_bias=True)
    got = np.asarray(ws_attack(
        jnp.asarray(x[None]), pixel_kernel=NAMED_FILTERS_2D["KB"],
        correct_bias=True))[0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-6)


def test_ws_recovers_change_rate_on_fixture(data_root):
    """beta_hat ~= alpha/2 on real LSBr stego (SURVEY.md §0 semantics)."""
    for alpha, rel in [(1.0, 0.05), (0.4, 0.1)]:
        sdir = data_root / f"stego_LSBr_alpha_{alpha}_independent_images"
        xs = np.stack([imread_gray_u8(sdir / f"{i}.png") for i in (6, 7, 8)])
        betas = np.asarray(ws_attack(
            jnp.asarray(xs), pixel_kernel=NAMED_FILTERS_2D["KB"]))
        np.testing.assert_allclose(betas.mean(), alpha / 2, rtol=rel)


def test_ws_estimate_unet_formula(data_root):
    """unet-variant: mean, unclipped (unet/evaluate.py:125-133)."""
    x = imread_gray_u8(data_root / "images" / "6.png").astype("float32")
    rng = np.random.default_rng(1)
    x_hat = x[1:-1, 1:-1] + rng.normal(scale=2.0, size=(510, 510)).astype("float32")
    xi = x[1:-1, 1:-1]
    x_bar = (xi.astype("uint8") ^ 1).astype("float32")
    want_beta = np.mean((xi - x_bar) * (xi - x_hat))
    want_l1 = np.mean(np.abs(xi - x_hat))
    beta, l1 = ws_estimate_unet(jnp.asarray(x[None]), jnp.asarray(x_hat[None]))
    np.testing.assert_allclose(np.asarray(beta)[0], want_beta, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l1)[0], want_l1, rtol=1e-5)


def test_ws_weights_normalized(data_root):
    x = imread_gray_u8(data_root / "images" / "9.png").astype("float32")
    w = np.asarray(ws_weights(jnp.asarray(x[None]), weighted=1))
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)


@pytest.mark.parametrize("shape", [(33, 47), (64, 31), (129, 257)])
@pytest.mark.parametrize("weighted", [0, 1])
def test_ws_attack_oracle_fuzz_odd_shapes(shape, weighted):
    """The weighted estimate (the KB-w headline detector) must match the
    oracle on non-square / odd dims, not just the 512x512 fixtures —
    SAME-vs-VALID window bookkeeping errors only show up off the happy
    shape."""
    rng = np.random.default_rng(sum(shape) + weighted)
    x = rng.integers(0, 256, shape, dtype=np.uint8)
    want = _numpy_ws_attack(x, NAMED_FILTERS_2D["KB"], weighted=weighted)
    got = np.asarray(ws_attack(
        jnp.asarray(x[None]), pixel_kernel=NAMED_FILTERS_2D["KB"],
        weighted=weighted))[0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-6)
