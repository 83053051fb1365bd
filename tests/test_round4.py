"""Round-4 additions: attested checkpoint admission, fold-aware OLS,
and the round-4 finisher's swap map.
"""
import json
import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

DATA = pathlib.Path("/root/reference/data")
SPLITS = REPO / "splits"


# ---------------------------------------------------------------- attestation

def test_is_leak_free_rule():
    from scripts.attest_checkpoints import is_leak_free
    assert is_leak_free({"select_metric": "last"})
    assert not is_leak_free({"select_metric": "ws"})
    assert not is_leak_free({})
    att_ok = {"best_is_latest": True, "patience_covers_schedule": True,
              "committed_matches_staging_best": True}
    assert is_leak_free({"select_metric": "ws",
                         "checkpoint_attestation": att_ok})
    for missing in att_ok:  # every attested fact is load-bearing
        broken = {**att_ok, missing: False}
        assert not is_leak_free({"select_metric": "ws",
                                 "checkpoint_attestation": broken})
        partial = {k: v for k, v in att_ok.items() if k != missing}
        assert not is_leak_free({"select_metric": "ws",
                                 "checkpoint_attestation": partial})


def test_committed_fold_a_unets_are_attested():
    """The committed fold-A UNets predate select_metric='last'; they may
    enter the holdout pool only through the md5 attestation
    (scripts/attest_checkpoints.py, ADVICE r3 medium)."""
    from scripts.attest_checkpoints import is_leak_free
    for cfg_path in sorted(REPO.glob("models/unet/*/*/config.json")):
        cfg = json.loads(cfg_path.read_text())
        assert is_leak_free(cfg), f"not leak-free: {cfg_path}"


def test_unet_entry_scan_applies_cleanliness_rule(tmp_path):
    from scripts.round3_holdout import _unet_entries

    base = tmp_path / "unet" / "LSBR"
    att = {"best_is_latest": True, "patience_covers_schedule": True,
           "committed_matches_staging_best": True}
    for name, cfg in [
            ("100000000000-leaky", {"select_metric": "ws"}),
            ("100000000001-attested", {"select_metric": "ws",
                                       "checkpoint_attestation": att}),
    ]:
        d = base / name
        (d / "model" / "best").mkdir(parents=True)
        (d / "config.json").write_text(json.dumps(
            {"network": "unet_2", **cfg}))
    entries = _unet_entries(tmp_path)
    assert entries == {"UNet": (base, "100000000001-attested")}


def test_b0_entry_scan_rejects_duplicate_labels(tmp_path):
    from scripts.round3_holdout import _b0_entries

    base = tmp_path / "b0" / "LSBR"
    for name in ("100000000000-a", "100000000001-b"):
        d = base / name
        (d / "model" / "best").mkdir(parents=True)
        (d / "config.json").write_text(json.dumps(
            {"stego_method": "LSBR", "alpha": [0.1],
             "select_metric": "last"}))
    with pytest.raises(RuntimeError, match="duplicate holdout label"):
        _b0_entries(tmp_path)


# ------------------------------------------------------------ fold-aware OLS

def test_holdout_ols_requires_train_split():
    from wsunet_tpu.detect import Fold, holdout_frames
    folds = [Fold(eval_split=str(SPLITS / "covers_8_10.csv"))]
    with pytest.raises(ValueError, match="train_split"):
        holdout_frames(DATA, folds, filter_models=("OLS",),
                       stego_methods=("LSBR",), alphas=(0.1,))


def test_holdout_ols_rows_carry_fold_provenance():
    """OLS taps are fitted on each fold's training covers and scored on
    its eval covers; pooled rows cover the full catalog (VERDICT r3
    item 4: OLS rows carry fold provenance like any trained detector)."""
    from wsunet_tpu.detect import Fold, holdout_frames
    folds = [
        Fold(eval_split=str(SPLITS / "covers_8_10.csv"),
             train_split="split_tr.csv"),
        Fold(eval_split=str(SPLITS / "covers_6_7_9.csv"),
             train_split=str(SPLITS / "covers_8_10.csv")),
    ]
    frames = holdout_frames(DATA, folds, filter_models=("OLS",),
                            stego_methods=("LSBR",), alphas=(0.1,),
                            batch_size=4)
    ols = frames[frames.model_name == "OLS"]
    assert set(ols["fold"]) == {"fold0", "fold1"}
    f0 = ols[ols.fold == "fold0"]["name"]
    assert len(f0) and all(("/8." in n) or ("/10." in n) for n in f0)
    f1 = ols[ols.fold == "fold1"]["name"]
    assert len(f1) and not any(("/8." in n) or ("/10." in n) for n in f1)


# -------------------------------------------------------------- r4 finisher

def test_round4_finish_swaps_match_chain_tags():
    """Every tag round4_finish swaps is one the round-3/round-4 chains
    can emit (ADVICE r3: a tag/STAGES mismatch silently skips a swap)."""
    from scripts.round4_finish import SWAPS

    emittable = {
        # round3_chain STAGE-DONE tags (stages that print final winners)
        "unet-lsbr-foldb", "unet-lsbr-foldb-dr", "nsr-foldb-final",
        "plain-folda-final", "hillr-b0-foldb-final", "nsr-folda-final",
        "unet-hillr-foldb", "plain-foldb-final", "hillr-b0-folda-final",
    }
    assert {t for t, *_ in SWAPS} <= emittable
    # and the destinations are well-formed
    for _, fold, family, method in SWAPS:
        assert fold in ("a", "b")
        assert family in ("unet", "b0")
        assert method in ("LSBR", "HILLR")
