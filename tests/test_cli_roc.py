"""CLI `roc` drive (filters only — CPU-fast) covering the multi-method
sweep: HILLR rows must land beside LSBR with per-model cover passes, and
the artifacts must follow the golden auc/roc schema."""
import pandas as pd
import pytest

from wsunet_tpu.cli import main as cli

DATA = "/root/reference/data"


@pytest.fixture(scope="module")
def outdir(tmp_path_factory):
    out = tmp_path_factory.mktemp("roc")
    cli(["roc", "--data", DATA, "--results", str(out),
         "--models", "AVG", "KB", "--stego-methods", "LSBR", "HILLR",
         "--batch-size", "4"])
    return out


def test_auc_table_has_both_methods(outdir):
    df = pd.read_csv(outdir / "detection" / "auc_0.01.csv")
    assert set(df["stego_method"]) == {"LSBR", "HILLR"}
    assert set(df["model_name"]) == {"AVG", "KB"}
    assert len(df) == 4
    # golden column contract
    assert list(df.columns[:4]) == ["stego_method", "model_name",
                                    "auc", "p_e"]
    # KB on LSBR reproduces the golden pooled value
    kb = df[(df.stego_method == "LSBR") & (df.model_name == "KB")]
    assert abs(kb["auc"].iloc[0] - 0.7333333333333333) < 1e-9


def test_roc_curves_written(outdir):
    roc = pd.read_csv(outdir / "detection" / "roc_0.01.csv")
    assert len(roc) == 501
    assert any("HILLR" in c for c in roc.columns)
    assert (outdir / "detection" / "roc_0.01.png").exists()
