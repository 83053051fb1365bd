"""Extended plain-B0 data-bound ablation (VERDICT r4 items 2+3 and the
r4 ADVICE medium finding).

Round 4 established the n in {2,3,4} cover-scaling points
(scripts/round4_ablation.py); the verdict asked for (a) a REAL n-axis —
patch covers pushing n to ~16 and ~64 — and (b) an honest rewrite of
docs/B0_DATA_BOUND.md, whose claim (i) cited the ns-r-B0 holdout row as
"golden-beating" while the committed table shows it below chance, and
whose "capacity is not the bound" reading leaned on an inconclusive n=4
point.

This script is EVAL-ONLY: the patch models are trained by
scripts/round5_chain.py (stages abl-p16/abl-p64 — the byte-identical
committed curriculum on data_ablation/p256 and p128, the 256^2/128^2
tilings of covers {6,7,8,9}) and swapped into
models_ablation/b0_p{256,128} by scripts/round5_finish.py.  Here we:

  1. score every available ablation point in-sample (the full covers
     whose content the model trained on) and out-of-sample (cover 10,
     untouched by any training/validation/checkpoint selection),
  2. write results/detection/b0_data_bound.csv with the extended n-axis,
  3. rewrite docs/B0_DATA_BOUND.md with claims its own tables support,
     citing the separate ns-r diagnosis (docs/NSR_HOLDOUT_DIAGNOSIS.md).

Points n in {2,3} reuse the committed holdout audit frame; {4,16,64}
are fresh sweeps.  Patch-model caveat recorded in the doc: patches of 4
covers add count but NOT content diversity beyond the random-crop
training the smaller-n points already use, so the n-axis isolates
"number of distinct training images" from "amount of distinct cover
content" — the two hypotheses the verdict asked the axis to separate.
"""
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.round4_ablation import (                      # noqa: E402
    CSV_OUT, DOC_OUT, _find_plain, _golden_b0, _roc_rows)

DATA = pathlib.Path("/root/reference/data")
SPLITS = REPO / "splits"

# n -> (train desc, holdout desc, in-sample split, holdout split, zoo)
POINTS = {
    2: ("{8,10}", "{6,7,9}", str(SPLITS / "covers_8_10.csv"),
        str(SPLITS / "covers_6_7_9.csv"), REPO / "models_foldb"),
    3: ("{6,7,9}", "{8,10}", str(SPLITS / "covers_6_7_9.csv"),
        str(SPLITS / "covers_8_10.csv"), REPO / "models"),
    4: ("{6,7,8,9}", "{10}", str(SPLITS / "covers_6_7_8_9.csv"),
        str(SPLITS / "cover_10.csv"), REPO / "models_ablation"),
    16: ("{6,7,8,9} as 16 256^2 patches", "{10}",
         str(SPLITS / "covers_6_7_8_9.csv"),
         str(SPLITS / "cover_10.csv"), REPO / "models_ablation"),
    64: ("{6,7,8,9} as 64 128^2 patches", "{10}",
         str(SPLITS / "covers_6_7_8_9.csv"),
         str(SPLITS / "cover_10.csv"), REPO / "models_ablation"),
}


def _abl_run(family: str):
    """The single run under models_ablation/<family>/LSBR, or None."""
    base = REPO / "models_ablation" / family / "LSBR"
    runs = sorted(p.parent.name for p in base.glob("*/config.json"))
    return runs[-1] if runs else None


def build_table():
    import pandas as pd
    from wsunet_tpu.cli import b0_label
    from wsunet_tpu.detect import Fold
    from wsunet_tpu.detect.holdout import holdout_frames

    rows = []

    def add(n, kind, run, vals, source):
        auc, p_e, auc001, pe001, lo, hi = vals
        train_c, hold_c = POINTS[n][0], POINTS[n][1]
        rows.append(dict(
            n_train_covers=n, train_covers=train_c,
            eval_covers=(train_c.split(" as ")[0] if kind == "in-sample"
                         else hold_c),
            eval_kind=kind, run=run, auc=auc, p_e=p_e,
            auc_lo=lo, auc_hi=hi, auc_a001=auc001, p_e_a001=pe001,
            source=source))

    # n in {2,3}: the committed audit frame (exact published scores)
    sh = pd.read_csv(REPO / "results/detection/scores_holdout.csv")
    plain = {2: _find_plain(REPO / "models_foldb"),
             3: _find_plain(REPO / "models")}
    for n, fold_tag in ((3, "fold0"), (2, "fold1")):
        run = plain[n]
        if run is None:
            continue
        cfg = json.loads((POINTS[n][4] / "b0/LSBR" / run / "config.json")
                         .read_text())
        label = b0_label(cfg)
        sub = sh[(sh["fold"] == fold_tag) & (sh["model_name"] == label)
                 & (sh["stego_method"].isin(["Cover", "LSBR"]))].copy()
        sub["score"] = sub["score"].astype(float)
        add(n, "holdout", run, _roc_rows(sub, label), "scores_holdout.csv")

    # fresh sweeps: in-sample for 2/3 + both kinds for 4/16/64
    specs = []  # (n, kind, zoo family dir, run)
    if plain[2]:
        specs.append((2, "in-sample", REPO / "models_foldb/b0", plain[2]))
    if plain[3]:
        specs.append((3, "in-sample", REPO / "models/b0", plain[3]))
    for n, family in ((4, "b0"), (16, "b0_p256"), (64, "b0_p128")):
        run = _abl_run(family)
        if run is None:
            print(f"ablation: point n={n} not trained yet; skipped")
            continue
        base = REPO / "models_ablation" / family
        specs.append((n, "in-sample", base, run))
        specs.append((n, "holdout", base, run))

    folds, tags = [], []
    for n, kind, base, run in specs:
        split = POINTS[n][2] if kind == "in-sample" else POINTS[n][3]
        # label must contain "B0" for detect.roc's detector dispatch
        folds.append(Fold(eval_split=split, b0s={
            "B0-abl": dict(model_dir=base, stego_method="LSBR",
                           model_name=run, lsbr_reference=False)}))
        tags.append((n, kind, run))
    if folds:
        scores = holdout_frames(DATA, folds, filter_models=(),
                                stego_methods=("LSBR",))
        for fi, (n, kind, run) in enumerate(tags):
            sub = scores[scores["fold"] == f"fold{fi}"]
            add(n, kind, run, _roc_rows(sub, "B0-abl"), "this sweep")

    df = pd.DataFrame(rows).sort_values(
        ["eval_kind", "n_train_covers"]).reset_index(drop=True)
    CSV_OUT.parent.mkdir(parents=True, exist_ok=True)
    df.to_csv(CSV_OUT, index=False)
    print(df.to_string())
    return df


def publish(df):
    g_auc, g_pe = _golden_b0()

    def fmt(kind):
        lines = []
        for _, r in df[df["eval_kind"] == kind].iterrows():
            lines.append(
                f"| {int(r.n_train_covers)} | {r.train_covers} | "
                f"{r.eval_covers} | {r.auc:.3f} | "
                f"[{r.auc_lo:.2f}, {r.auc_hi:.2f}] | {r.p_e:.3f} | "
                f"{r.auc_a001:.3f} |")
        return "\n".join(lines)

    hold = df[df.eval_kind == "holdout"].set_index("n_train_covers")
    ins = df[df.eval_kind == "in-sample"].set_index("n_train_covers")

    def _pair(n):
        """'(n=K: X in-sample vs Y holdout)' from the table itself, so the
        prose can never contradict the committed rows (the r4 failure)."""
        if n not in ins.index or n not in hold.index:
            return None
        return (f"n={n}: {float(ins.loc[n, 'auc']):.3f} in-sample vs "
                f"{float(hold.loc[n, 'auc']):.3f} holdout")

    pairs = ("; ".join(p for p in (_pair(2), _pair(3)) if p)
             or "see the tables above")

    ins_curve = ", ".join(
        f"n={int(n)}: {float(ins.loc[n, 'auc']):.3f}"
        for n in sorted(ins.index))

    n4txt = ""
    if 4 in ins.index and 4 in hold.index:
        gap4 = float(ins.loc[4, "auc"]) - float(hold.loc[4, "auc"])
        chance4 = (float(hold.loc[4, "auc_lo"]) <= 0.5
                   <= float(hold.loc[4, "auc_hi"]))
        if gap4 > 0.15 and not chance4:
            n4txt = (f"  The n=4 point now shows the same contrast "
                     f"({_pair(4)}).")
        else:
            n4txt = ("  The n=4 point is inconclusive on this contrast "
                     f"({_pair(4)}, holdout CI "
                     f"[{float(hold.loc[4, 'auc_lo']):.2f}, "
                     f"{float(hold.loc[4, 'auc_hi']):.2f}]) and is NOT "
                     "evidence of capacity headroom on its own (r4 "
                     "advisor finding) — the capacity claim rests on "
                     "n ∈ {2, 3} and on the diagnosis below.")
    patch = hold[hold.index > 4]
    small_max = float(hold.loc[[2, 3], "auc"].max())
    trend = "stays flat within its confidence intervals"
    if len(patch):
        best_n = int(patch["auc"].idxmax())
        best_auc = float(patch.loc[best_n, "auc"])
        best_pe = float(patch.loc[best_n, "p_e"])
        if best_auc >= small_max + 0.15:
            sat = ""
            if best_pe >= 0.4:
                sat = (" — by score RANK on the single holdout cover; "
                       f"its P_E {best_pe:.2f} shows the scores are "
                       "saturated near a constant (the confidence-"
                       "collapse mode of docs/NSR_HOLDOUT_DIAGNOSIS.md), "
                       "so the lift is a ranking signal, not an "
                       "operating point")
            trend = (f"lifts at the patch points (best: n={best_n}, "
                     f"AUC {best_auc:.3f}{sat})")

    hdr = ("| train covers (n) | trained on | scored on | AUC | "
           "AUC 95% CI | P_E | AUC (α=0.01 only) |\n"
           "|---|---|---|---|---|---|---|")
    doc = f"""# Plain-B0 at golden parity is data-bound, not recipe-bound

The reference's golden plain-B0 detection row — **AUC {g_auc:.3f} /
P_E {g_pe:.3f}** on LSBR (reference `results/detection/auc_0.01.csv`) —
comes from a model trained on the **BOSS corpus (10,000 covers,
300-epoch schedule, no pretraining)** and evaluated on the bundled
5-cover fixture: reference
`models/b0/LSBR/240216104800-*/config.json` names
`dataset=.../boss/fabrika-2024-01-18`, `num_epochs=300`,
`pretrained=false`.  This repo has no BOSS: its detectors train on the
fixture itself under the leak-free 2-fold protocol
(`docs/EVAL_PROTOCOL.md`).  This note is the ablation evidence that the
remaining gap on that row tracks the training data, not the framework's
trainer, model, or recipe — with the n-axis extended past the fixture's
4 distinct covers by patch tiling (VERDICT r4 item 3).

## Protocol

Every point uses the **same committed curriculum** that produced the
fold-zoo plain-B0 models (`scripts/round3_chain.b0_curriculum`: rate-mix
curriculum α .4/.2/.1 → .1/.05/.01 → eval-resolution stage → BN
recalibration → freeze-BN polish; `select_metric="last"`, validation
inside the training set).  The only axis varied is the set of training
cover images:

- n ∈ {{2, 3}}: the committed fold models; scores are the exact
  per-image scores behind the published holdout table
  (`results/detection/scores_holdout.csv`), re-grouped per fold.
- n = 4: covers {{6,7,8,9}}, scored on untouched cover 10
  (`models_ablation/b0/`).
- n ∈ {{16, 64}}: covers {{6,7,8,9}} tiled into 256²/128² patches
  (`scripts/round5_patches.py`, `data_ablation/`), each patch a training
  cover in its own right; scored on untouched cover 10.  Config surface
  identical (crops cap at the patch size).  **Caveat by design**: the
  patches multiply the *count* of training images but not the *content*
  diversity beyond what random crops of the same 4 covers already gave
  the n=4 point — so this axis separates "more training images" from
  "more distinct cover content".

Pooled-α semantics match the golden artifact (α ∈ {{.1,.05,.01}});
generated by `scripts/round5_ablation.py` into
`results/detection/b0_data_bound.csv`.  The n ≥ 4 points score on a
SINGLE untouched cover (one cover + three stego images per point), so
their pooled AUC moves in steps of 1/3 and the bootstrap CIs are
correspondingly coarse — read the n-axis as a trend, not as point
estimates.

## Out-of-sample (held-out covers) — the honest row

{hdr}
{fmt('holdout')}

Golden reference: AUC **{g_auc:.3f}** / P_E {g_pe:.3f} — trained on
**n = 10,000** covers (BOSS), scored on all 5 fixture covers.

## In-sample (each model on its own training covers' content)

{hdr}
{fmt('in-sample')}

## Reading

- **The out-of-sample curve {trend}** as n grows within the fixture's
  content budget.  Against the reference's n = 10,000 *distinct* covers,
  the patch points show what image count alone buys when cover content
  is capped at 4 scenes.
- **The in-sample/holdout contrast at small n** ({pairs}) shows the
  model + curriculum extract the LSBR statistic on familiar covers
  while failing to carry it to unseen ones.{n4txt}
- **In-sample AUC under the FIXED step budget** ({ins_curve}): every
  point trains the same number of steps regardless of n (the committed
  curriculum is byte-identical), so in-sample movement as n grows
  reflects the budget's per-image fit dilution (and, at the patch
  points, the same score saturation visible in the holdout P_E column),
  not a capacity ceiling measurement — which is why the capacity claim
  above leans on the small-n points, where the budget saturates the
  training set (r4 verdict, weak item 2).
- **Generalization across cover content is the bound.**  The companion
  diagnosis `docs/NSR_HOLDOUT_DIAGNOSIS.md` shows the strongest
  detector variant (oracle-plane ns-r-B0) detects cleanly in-sample but
  pins every UNSEEN cover to a saturated constant — fold A ≈ 1.0,
  fold B ≈ 0.0, for cover and stego alike — a cover-conditioned
  confidence collapse; the pooled sub-chance holdout AUC (0.333) is the
  artifact of pooling those two oppositely-saturated score scales, not
  an inverted detector and not a pipeline bug.
- **The framework is not the bound** (evidence its own tables support):
  (i) the weight-free `KB-w` row in the published holdout table reaches
  AUC 1.000 / P_E 0.000 through the same WS/eval stack — above every
  golden detector — so the evaluation pipeline loses nothing; (ii) the
  in-sample rows at n ∈ {{2, 3}} plus the in-sample detection shown in
  the diagnosis doc.  (The round-4 version of this note cited the
  ns-r-B0 holdout row as "golden-beating"; that was wrong — the
  committed row is 0.333 — and is corrected by the diagnosis doc.)

This remains the negative result VERDICT r3 scoped ("if the recipe
genuinely tops out without BOSS/ImageNet, commit a negative-result note
with the ablation table"), now with the n-axis the r4 verdict asked for.
"""
    DOC_OUT.write_text(doc)

    # README pointer between the markers
    readme = (REPO / "README.md").read_text()
    start, end = "<!-- b0-bound:start -->", "<!-- b0-bound:end -->"
    if start in readme and end in readme:
        head, rest = readme.split(start, 1)
        _, tail = rest.split(end, 1)
        big = hold[hold.index > 4]
        bigtxt = ""
        if len(big):
            n_big = int(big["auc"].idxmax())
            bigtxt = (f" extending n via patch covers reaches AUC "
                      f"{float(big.loc[n_big, 'auc']):.3f} "
                      f"(P_E {float(big.loc[n_big, 'p_e']):.2f}) "
                      f"at n={n_big}")
        pointer = (
            f"{start}\nThe remaining sub-golden trained row (plain B0 "
            f"{g_auc:.3f} golden vs fixture-trained) is **data-bound, "
            f"not recipe-bound**: the golden model trained on 10k "
            f"distinct BOSS covers, this repo's folds hold 2-4 scenes;"
            f"{bigtxt} out-of-sample.  Ablation + diagnosis: "
            f"[docs/B0_DATA_BOUND.md](docs/B0_DATA_BOUND.md), "
            f"[docs/NSR_HOLDOUT_DIAGNOSIS.md](docs/NSR_HOLDOUT_DIAGNOSIS.md) "
            f"(`results/detection/b0_data_bound.csv`).\n{end}")
        (REPO / "README.md").write_text(head + pointer + tail)


def main(cpu: bool = False):
    if cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    df = build_table()
    publish(df)
    print("ABL5-DONE", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(cpu="--cpu" in sys.argv))
