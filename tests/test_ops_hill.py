"""HILL cost map parity with the conseal-based golden wMAE numbers."""

import numpy as np
import pandas as pd

import jax.numpy as jnp

from wsunet_tpu.io import imread_gray_u8
from wsunet_tpu.ops import NAMED_FILTERS, filter_residuals, hill_cost
from wsunet_tpu.ops.filters import taps_to_kernel2d


def test_wmae_matches_golden(data_root, results_root):
    """wMAE over lowest-decile HILL-cost pixels equals
    results/prediction/filters.csv (filters/evaluate.py:79-115)."""
    golden = pd.read_csv(results_root / "prediction" / "filters.csv")
    for fname in ["6.png", "8.png"]:
        x = imread_gray_u8(data_root / "images" / fname).astype("float32")
        rho = np.asarray(hill_cost(jnp.asarray(x), wet_cost=1e10))
        rho_i = rho[1:-1, 1:-1]
        row = golden[golden["name"] == f"images/{fname}"]
        for filt in ["KB", "AVG"]:
            k2 = taps_to_kernel2d(NAMED_FILTERS[filt])
            resid = np.asarray(filter_residuals(jnp.asarray(x[None]), k2))[0]
            wmae = np.nanmean(
                np.abs(resid)[rho_i <= np.quantile(rho_i, 0.1)])
            want = row[f"wmae_3_{filt}"].dropna().iloc[0]
            np.testing.assert_allclose(wmae, want, rtol=1e-4)
