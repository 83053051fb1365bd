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
