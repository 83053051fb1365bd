"""Splice the rendered holdout-vs-golden table into README.md and
PARITY.md between the `<!-- holdout-table:start/end -->` markers.

Idempotent: re-running after a results regeneration replaces the block
in place, so the committed docs always quote the CSV they cite
(`results/detection/auc_0.01_holdout.csv`).  Rendering is
scripts/round4_report.render (tested in tests/test_round4_report.py).

Usage: python scripts/round4_publish.py [--csv <holdout csv>]
"""
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.round4_report import render                  # noqa: E402

START = "<!-- holdout-table:start -->"
END = "<!-- holdout-table:end -->"


def splice(path: pathlib.Path, block: str) -> None:
    text = path.read_text()
    i = text.index(START) + len(START)
    j = text.index(END)
    path.write_text(text[:i] + "\n" + block + "\n" + text[j:])
    print(f"published holdout table -> {path.name}")


def main(csv: pathlib.Path) -> int:
    if not csv.exists():
        print(f"publish: {csv} does not exist; nothing to do")
        return 1
    block = render(csv)
    for doc in [REPO / "README.md", REPO / "PARITY.md"]:
        splice(doc, block)
    return 0


if __name__ == "__main__":
    csv = REPO / "results/detection/auc_0.01_holdout.csv"
    if "--csv" in sys.argv:
        csv = pathlib.Path(sys.argv[sys.argv.index("--csv") + 1])
    raise SystemExit(main(csv))
