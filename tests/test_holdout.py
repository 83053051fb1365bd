"""Cross-fold holdout evaluation (detect/holdout.py).

The pooling invariant: scoring a deterministic (weight-free) detector
per-fold on complementary eval splits and pooling must reproduce the
full-catalog evaluation exactly — same per-image scores, same pooled
ROC/AUC.  The fixture folds are covers {6,7,9} vs {8,10}
(splits/covers_*.csv, built from the reference files.csv catalog).
"""
import pathlib

import numpy as np
import pytest

from wsunet_tpu.detect import Fold, holdout_frames, holdout_roc
from wsunet_tpu.detect.roc import produce_roc

DATA = pathlib.Path("/root/reference/data")
REPO = pathlib.Path(__file__).resolve().parents[1]
SPLITS = REPO / "splits"

FOLDS = [
    Fold(eval_split=str(SPLITS / "covers_8_10.csv"),
         unets={"KBfold": (None, "KB")}),
    Fold(eval_split=str(SPLITS / "covers_6_7_9.csv"),
         unets={"KBfold": (None, "KB")}),
]


@pytest.fixture(scope="module")
def frames():
    return holdout_frames(
        DATA, FOLDS, filter_models=("KB",), stego_methods=("LSBR",),
        alphas=(0.1, 0.01), batch_size=4)


def test_fold_splits_partition_catalog(frames):
    pooled = frames[frames.model_name == "KBfold"]
    full = frames[frames.model_name == "KB"]
    assert sorted(pooled["name"]) == sorted(full["name"])
    # fold rows carry their eval-split provenance
    assert set(pooled["fold"]) == {"fold0", "fold1"}
    f0 = pooled[pooled.fold == "fold0"]["name"]
    assert all(("/8." in n) or ("/10." in n) for n in f0)


def test_pooled_scores_match_full_catalog(frames):
    pooled = frames[frames.model_name == "KBfold"].sort_values("name")
    full = frames[frames.model_name == "KB"].sort_values("name")
    np.testing.assert_allclose(
        pooled["beta_hat"].to_numpy(), full["beta_hat"].to_numpy(),
        rtol=0, atol=0)


def test_pooled_roc_matches_full_catalog(frames):
    roc = produce_roc(frames)
    auc = roc[["model_name", "auc", "p_e"]].drop_duplicates()
    a = auc[auc.model_name == "KBfold"].iloc[0]
    b = auc[auc.model_name == "KB"].iloc[0]
    assert a["auc"] == b["auc"] and a["p_e"] == b["p_e"]


def test_holdout_roc_writes_artifacts(frames, tmp_path):
    df = holdout_roc(
        DATA, FOLDS, results_dir=tmp_path, suffix="t",
        filter_models=("KB",), stego_methods=("LSBR",),
        alphas=(0.1, 0.01), batch_size=4)
    out = tmp_path / "detection"
    assert (out / "auc_0.01_t.csv").exists()
    assert (out / "roc_0.01_t.csv").exists()
    assert (out / "scores_t.csv").exists()
    assert {"stego_method", "model_name", "auc", "p_e"} <= set(df.columns)
    # bootstrap-CI sidecar: one row per published detector row, and each
    # point estimate must sit inside its own interval
    import pandas as pd
    ci = pd.read_csv(out / "auc_0.01_t_ci.csv")
    merged = df.merge(ci, on=["stego_method", "model_name"])
    assert len(merged) == len(df)
    assert ((merged["auc"] >= merged["auc_lo"] - 1e-12) &
            (merged["auc"] <= merged["auc_hi"] + 1e-12)).all()
    # per-alpha breakout sidecar: one row per (alpha, detector) cell
    by_alpha = pd.read_csv(out / "auc_by_alpha_t.csv")
    assert set(by_alpha["alpha"]) == {0.1, 0.01}
    assert len(by_alpha) == 2 * len(df)
    assert {"alpha", "stego_method", "model_name", "auc",
            "p_e"} <= set(by_alpha.columns)


def test_b0_entry_scan_excludes_non_last_selection(tmp_path):
    """round3_holdout._b0_entries only admits end-of-schedule ("last")
    checkpoints: selection by a validation metric is part of training,
    and the round-2 B0s validated on a fold-A EVAL cover."""
    import json
    import sys
    sys.path.insert(0, str(REPO))
    from scripts.round3_holdout import _b0_entries

    base = tmp_path / "b0" / "LSBR"
    for name, select in [("100000000000-clean", "last"),
                         ("100000000001-leaky", "p_e"),
                         ("100000000002-legacy", None)]:
        d = base / name
        (d / "model" / "best").mkdir(parents=True)
        cfg = {"stego_method": "LSBR", "alpha": [0.1], "select_metric":
               select, "no_stem_stride": name.endswith("clean")}
        (d / "config.json").write_text(json.dumps(cfg))
    entries = _b0_entries(tmp_path)
    assert len(entries) == 1
    (label, spec), = entries.items()
    assert spec["model_name"] == "100000000000-clean"


def test_finish_stage_done_parses_markers():
    """round3_finish reads STAGE-DONE markers (names or paths) and maps
    them to basenames for the swap step."""
    import sys
    sys.path.insert(0, str(REPO))
    from scripts.round3_finish import SWAPS, stage_done

    log = "\n".join([
        "=== stage 1: stage_unet_lsbr_foldb_dr ===",
        "STAGE-DONE unet-lsbr-foldb-dr: /abs/models_r3/unet/LSBR/2608-dr",
        "noise line",
        "STAGE-DONE nsr-foldb-s1: 2608-s1",
        "STAGE-DONE nsr-foldb-final: 2608-final",
    ])
    done = stage_done(log)
    assert done["unet-lsbr-foldb-dr"] == "2608-dr"
    assert done["nsr-foldb-final"] == "2608-final"
    # every swap tag the finisher acts on is a tag the chain can emit
    assert {t for t, *_ in SWAPS} <= {
        "unet-lsbr-foldb-dr", "nsr-foldb-final", "plain-folda-final",
        "hillr-b0-foldb-final"}
