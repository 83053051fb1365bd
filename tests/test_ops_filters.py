"""Filter kernels vs numpy/scipy oracles and golden CSV values."""

import numpy as np
import pandas as pd
import pytest
import scipy.signal

import jax.numpy as jnp

from wsunet_tpu.io import imread4_f32, imread_gray_u8
from wsunet_tpu.ops import (
    NAMED_FILTERS,
    NAMED_FILTERS_2D,
    conv2d_valid,
    filter_predict,
    filter_residuals,
)
from wsunet_tpu.ops.filters import taps_to_kernel2d


def test_conv2d_valid_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 40)).astype("float32")
    k = rng.normal(size=(3, 3)).astype("float32")
    got = np.asarray(conv2d_valid(jnp.asarray(x), k))
    for b in range(2):
        want = scipy.signal.correlate(x[b], k, mode="valid")
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("name", ["KB", "AVG", "AVG9", "1"])
def test_filter_predict_matches_reference_formula(name, data_root):
    """x_hat == scipy convolve(x/255, k_ref, 'valid')*255 with the
    reference's transposed-kernel storage (filters/evaluate.py:136-141)."""
    x = imread4_f32(data_root / "images" / "6.png")[..., 3]
    # reference kernel storage: np.array([[rows]]).T -> (3,3,1)
    k_ref = NAMED_FILTERS_2D[name].T[..., None]
    want = scipy.signal.convolve(
        (x[..., None]) / 255.0, k_ref[..., ::-1], mode="valid")[..., 0] * 255.0
    got = np.asarray(filter_predict(jnp.asarray(x), NAMED_FILTERS_2D[name]))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_filter_residuals_match_golden_mae(data_root, results_root):
    """MAE per cover image equals results/prediction/filters.csv."""
    golden = pd.read_csv(results_root / "prediction" / "filters.csv")
    for fname in ["6.png", "7.png", "8.png", "9.png", "10.png"]:
        x = imread_gray_u8(data_root / "images" / fname).astype("float32")
        row = golden[golden["name"] == f"images/{fname}"]
        for filt in ["KB", "AVG"]:
            k2 = taps_to_kernel2d(NAMED_FILTERS[filt])
            resid = np.asarray(filter_residuals(jnp.asarray(x[None]), k2))[0]
            mae = np.nanmean(np.abs(resid))
            want = row[f"mae_3_{filt}"].dropna().iloc[0]
            np.testing.assert_allclose(mae, want, rtol=1e-5)


def test_ols_is_least_squares_optimal(data_root):
    """The fitted taps minimize SSE by construction: OLS residual SSE must
    not exceed any fixed 8-tap filter's (KB, AVG) on its training covers."""
    import numpy as np
    import jax.numpy as jnp
    from wsunet_tpu.io import imread_gray_u8
    from wsunet_tpu.ops import filter_residuals, NAMED_FILTERS
    from wsunet_tpu.ops.filters import taps_to_kernel2d
    from wsunet_tpu.ops.ols import ols_kernel2d

    xs = np.stack([imread_gray_u8(data_root / "images" / f"{i}.png")
                   for i in (6, 7)]).astype("float32")
    xj = jnp.asarray(xs)

    def sse(k2):
        return float((np.asarray(filter_residuals(xj, k2)) ** 2).sum())

    sse_ols = sse(ols_kernel2d(xs))
    for name in ["KB", "AVG"]:
        assert sse_ols <= sse(taps_to_kernel2d(NAMED_FILTERS[name])) * (1 + 1e-5)


def test_ols_beats_avg_on_covers(data_root):
    import numpy as np
    import jax.numpy as jnp
    from wsunet_tpu.io import imread_gray_u8
    from wsunet_tpu.ops import filter_residuals, NAMED_FILTERS
    from wsunet_tpu.ops.filters import taps_to_kernel2d
    from wsunet_tpu.ops.ols import ols_kernel2d

    xs = np.stack([imread_gray_u8(data_root / "images" / f"{i}.png")
                   for i in (6, 7, 8, 9, 10)]).astype("float32")
    k_ols = ols_kernel2d(xs)
    mae_ols = float(np.abs(np.asarray(
        filter_residuals(jnp.asarray(xs), k_ols))).mean())
    k_avg = taps_to_kernel2d(NAMED_FILTERS["AVG"])
    mae_avg = float(np.abs(np.asarray(
        filter_residuals(jnp.asarray(xs), k_avg))).mean())
    assert mae_ols < mae_avg, (mae_ols, mae_avg)
