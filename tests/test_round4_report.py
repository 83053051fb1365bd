"""The README/PARITY table generator renders holdout-vs-golden rows
faithfully (weight-free rows must show golden-exact equality)."""
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.round4_report import render  # noqa: E402


def test_render_pools_golden_columns():
    md = render(REPO / "results/detection/auc_0.01.csv")
    lines = md.splitlines()
    assert lines[0].startswith("| method | detector |")
    kb = next(l for l in lines if l.startswith("| LSBR | KB |"))
    # KB is weight-free: holdout and golden columns must be identical
    cells = [c.strip() for c in kb.strip("|").split("|")]
    assert cells[2] == cells[4] == "0.733"
    assert cells[3] == cells[5] == "0.167"


def test_render_marks_rows_without_golden():
    md = render(REPO / "results/detection/auc_0.01.csv")
    hillr = [l for l in md.splitlines() if l.startswith("| HILLR ")]
    # our HILLR detector rows have no reference counterpart -> dashes
    assert hillr and all(l.rstrip("|").rstrip().endswith("| -") or
                         "| - |" in l for l in hillr)


def test_render_adds_ci_column_when_sidecar_exists(tmp_path):
    import shutil
    src = REPO / "results/detection/auc_0.01_holdout.csv"
    ci = REPO / "results/detection/auc_0.01_holdout_ci.csv"
    # without the sidecar: no CI column
    shutil.copy(src, tmp_path / "auc.csv")
    md = render(tmp_path / "auc.csv")
    assert "AUC 95% CI" not in md
    # with it: the column renders, and a degenerate perfect separator
    # shows a collapsed interval
    shutil.copy(ci, tmp_path / "auc_ci.csv")
    md = render(tmp_path / "auc.csv")
    assert "AUC 95% CI" in md.splitlines()[0]
    kbw = next(l for l in md.splitlines()
               if l.startswith("| LSBR | KB-w |"))
    assert "[1.00, 1.00]" in kbw
    # header and separator column counts agree
    assert md.splitlines()[0].count("|") == md.splitlines()[1].count("|")
