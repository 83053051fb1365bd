"""Schema guards for the committed results/ tree.

Round 1 lost the golden-schema ws_LSBR.csv to a filename collision (the WS
filter sweep overwrote unet-eval's output; the reference has the same
hazard, ws/estimate.py:280 vs unet/evaluate.py:229).  These tests pin the
committed artifacts to the reference schemas so the tree cannot silently
lose them again.
"""

import pathlib

import pandas as pd
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
REF = pathlib.Path("/root/reference/results")


def _cols(path):
    return list(pd.read_csv(path, nrows=1).columns)


@pytest.mark.parametrize("name", ["ws_LSBR.csv", "ws_dropout.csv",
                                  "ws_HILLR.csv"])
def test_unet_eval_golden_schema(name):
    """results/estimation/ws_<method>.csv keeps the reference's unet-eval
    schema (name..beta_hat, l1, ...)."""
    got = REPO / "results" / "estimation" / name
    want = REF / "estimation" / name
    if not got.exists():
        pytest.skip(f"{name} not regenerated yet")
    assert _cols(got) == _cols(want), (
        f"{name} lost the golden unet-eval schema — did the WS sweep "
        f"overwrite it? (sweep writes ws_sweep_<method>.csv)")


def test_sweep_file_is_distinct():
    """The WS filter sweep writes its own file, never ws_<method>.csv."""
    sweep = REPO / "results" / "estimation" / "ws_sweep_LSBR.csv"
    if not sweep.exists():
        pytest.skip("sweep output not regenerated yet")
    cols = _cols(sweep)
    assert "model_name" in cols and "weighted" in cols


def test_auc_csv_schema():
    got = REPO / "results" / "detection" / "auc_0.01.csv"
    cols = _cols(got)
    for c in ["stego_method", "model_name", "auc", "p_e", "tau0",
              "fpr_tau0", "tpr_tau0", "fpr_50", "tpr_50"]:
        assert c in cols
