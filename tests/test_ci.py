"""Bootstrap CI correctness: the vectorized resampling must agree with a
brute-force recompute that feeds each resample through the exact
published statistic (produce_roc's grid AUC / P_E)."""
import numpy as np
import pandas as pd
import pytest

from wsunet_tpu.detect.ci import bootstrap_auc_pe, bootstrap_roc_cis
from wsunet_tpu.detect.roc import produce_roc


def _frame(y_hat, y, model="KB", method="LSBR"):
    return pd.DataFrame({
        "stego_method": np.where(np.asarray(y) > 0, method, "Cover"),
        "model_name": model,
        "beta_hat": y_hat,
        "alpha": np.asarray(y) * 2.0,
    })


def test_perfect_separator_ci_is_degenerate():
    y_hat = np.array([0.0, 0.0, 0.0, 0.4, 0.5, 0.6])
    y = np.array([0.0, 0.0, 0.0, 0.1, 0.1, 0.1])
    out = bootstrap_auc_pe(y_hat, y, n_boot=500)
    # every stego resample stays above every cover resample
    assert out["auc_lo"] == 1.0 and out["auc_hi"] == 1.0
    assert out["p_e_lo"] == 0.0 and out["p_e_hi"] == 0.0
    assert out["n_cover"] == 3 and out["n_stego"] == 3


def test_vectorized_matches_bruteforce_grid_recompute():
    rng = np.random.default_rng(3)
    n_cov, n_st = 5, 12
    y = np.r_[np.zeros(n_cov), np.full(n_st, 0.05)]
    y_hat = np.clip(np.r_[rng.normal(0.05, 0.05, n_cov),
                          rng.normal(0.12, 0.08, n_st)], 0, None)

    n_boot = 64
    fast = bootstrap_auc_pe(y_hat, y, n_boot=n_boot, seed=11)

    # brute force: replay the identical resample index stream and feed
    # each resample through produce_roc itself
    rng2 = np.random.default_rng(11)
    sp, sn = y_hat[y > 0], y_hat[y <= 0]
    idx_p = rng2.integers(0, len(sp), size=(n_boot, len(sp)))
    idx_n = rng2.integers(0, len(sn), size=(n_boot, len(sn)))
    aucs, pes = [], []
    for b in range(n_boot):
        yh = np.r_[sn[idx_n[b]], sp[idx_p[b]]]
        yy = np.r_[np.zeros(len(sn)), np.full(len(sp), 0.05)]
        roc = produce_roc(_frame(yh, yy))
        aucs.append(roc["auc"].iloc[0])
        pes.append(roc["p_e"].iloc[0])
    assert fast["auc_lo"] == pytest.approx(np.quantile(aucs, 0.025))
    assert fast["auc_hi"] == pytest.approx(np.quantile(aucs, 0.975))
    assert fast["p_e_lo"] == pytest.approx(np.quantile(pes, 0.025))
    assert fast["p_e_hi"] == pytest.approx(np.quantile(pes, 0.975))


def test_counts_order_matches_index_stream():
    """bootstrap_auc_pe draws positives first, then negatives, from one
    generator — pinned here because the brute-force test above relies on
    replaying that stream."""
    from wsunet_tpu.detect.ci import _counts
    rng_a = np.random.default_rng(5)
    cp = _counts(rng_a, 3, 4)
    cn = _counts(rng_a, 3, 2)
    rng_b = np.random.default_rng(5)
    ip = rng_b.integers(0, 4, size=(3, 4))
    inn = rng_b.integers(0, 2, size=(3, 2))
    for b in range(3):
        assert cp[b].sum() == 4 and cn[b].sum() == 2
        np.testing.assert_array_equal(
            cp[b], np.bincount(ip[b], minlength=4))
        np.testing.assert_array_equal(
            cn[b], np.bincount(inn[b], minlength=2))


def test_frame_level_cis_cover_point_estimates():
    """On the committed holdout scores, every point AUC/P_E must lie
    inside its own bootstrap interval."""
    import pathlib
    scores_csv = pathlib.Path(__file__).parent.parent / \
        "results/detection/scores_holdout.csv"
    if not scores_csv.exists():
        pytest.skip("holdout scores not generated yet")
    scores = pd.read_csv(scores_csv)
    cis = bootstrap_roc_cis(scores, n_boot=300)
    point = produce_roc(scores)[
        ["stego_method", "model_name", "auc", "p_e"]].drop_duplicates()
    merged = point.merge(cis, on=["stego_method", "model_name"])
    assert len(merged) == len(point)
    ok_auc = merged["auc"].isna() | (
        (merged["auc"] >= merged["auc_lo"] - 1e-12) &
        (merged["auc"] <= merged["auc_hi"] + 1e-12))
    ok_pe = ((merged["p_e"] >= merged["p_e_lo"] - 1e-12) &
             (merged["p_e"] <= merged["p_e_hi"] + 1e-12))
    assert ok_auc.all(), merged[~ok_auc]
    assert ok_pe.all(), merged[~ok_pe]
