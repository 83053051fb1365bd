"""WS-UNet recipe sweep table + data-bound analysis (VERDICT r4 item 4,
HILLR leg item 5).

Round 4's holdout WS-UNet row was 0.633 pooled LSBR vs golden 0.867,
with no analysis of whether the gap is recipe- or data-bound.  Round 5
trains the REFERENCE-ANCHOR recipe (the lambda=0.25 weighted l1ws the
shipped checkpoints record — reference models/unet/LSBR/240222160214-*/
config.json — plus a full-resolution 512^2 fine-tune, the resolution the
anchor trained at; recipe pre-committed in scripts/round5_chain.py
BEFORE any holdout score of these runs existed).  This script builds the
committed comparison:

  results/detection/unet_recipe_sweep.csv
  docs/UNET_RECIPE_SWEEP.md

Rows per (method in {LSBR, HILLR}, recipe in {old committed, anchor}):
pooled leak-free holdout AUC/P_E (+CI) and the per-alpha breakout, plus
an in/out-of-sample contrast for the anchor recipe (the UNET analogue of
docs/B0_DATA_BOUND.md).  Old-recipe scores come from the round-4 audit
frame snapshot (results/detection/unet_recipe_r4_scores.csv — the exact
scores behind the round-4 published table); anchor rows come from fresh
leak-free sweeps of the swapped runs.  Run at the round-5 end-game
AFTER scripts/round5_finish.py swaps the winners.
"""
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DATA = pathlib.Path("/root/reference/data")
SPLITS = REPO / "splits"
CSV_OUT = REPO / "results/detection/unet_recipe_sweep.csv"
DOC_OUT = REPO / "docs/UNET_RECIPE_SWEEP.md"
R4_SCORES = REPO / "results/detection/unet_recipe_r4_scores.csv"

# fold -> (zoo, eval/in-sample splits)
FOLD_SPECS = [
    ("fold0", REPO / "models", str(SPLITS / "covers_8_10.csv"),
     str(SPLITS / "covers_6_7_9.csv")),
    ("fold1", REPO / "models_foldb", str(SPLITS / "covers_6_7_9.csv"),
     str(SPLITS / "covers_8_10.csv")),
]
GOLDEN = {"LSBR": 0.8667}  # reference auc_0.01.csv UNet row (LSBR only)


def _anchor_run(zoo: pathlib.Path, method: str):
    """Newest run under <zoo>/unet/<method> whose config records the
    anchor recipe (weighted_loss)."""
    base = zoo / "unet" / method
    runs = []
    for cfgp in sorted(base.glob("*/config.json")):
        cfg = json.loads(cfgp.read_text())
        if cfg.get("weighted_loss"):
            runs.append(cfgp.parent.name)
    return runs[-1] if runs else None


def _rows_from_scores(sub, label):
    """pooled + per-alpha AUC/P_E (+CI) from a per-image score frame."""
    from scripts.round4_ablation import _roc_rows
    auc, p_e, auc001, pe001, lo, hi = _roc_rows(sub, label)
    return dict(auc=auc, p_e=p_e, auc_lo=lo, auc_hi=hi,
                auc_a001=auc001, p_e_a001=pe001)


def _sweep(zoo, method, run, split):
    """Fresh leak-free WS sweep of one run over one split; returns the
    per-image frame in the audit-frame schema."""
    import pandas as pd
    from wsunet_tpu.ws import ws_run
    frames = []
    for sm in [None, method]:
        for alpha in ([0.1, 0.05, 0.01] if sm else [None]):
            res = ws_run(input_dir=DATA, stego_method=sm, alpha=alpha,
                         model_name=run, model_path=zoo / "unet" / method,
                         model_label="UNet-anchor", batch_size=8,
                         split=split)
            frames.append(res)
    df = pd.concat(frames).reset_index(drop=True)
    df["stego_method"] = df["stego_method"].fillna("Cover")
    df["alpha"] = df["alpha"].fillna(0.0)
    df["score"] = df["beta_hat"]
    return df


def build():
    import pandas as pd

    rows = []

    def add(method, recipe, kind, run, stats):
        rows.append(dict(stego_method=method, recipe=recipe,
                         eval_kind=kind, run=run, **stats))

    # old committed recipe: pooled holdout from the r4 audit snapshot
    old = pd.read_csv(R4_SCORES)
    for method, label in (("LSBR", "UNet"), ("HILLR", "UNet_HILLR")):
        sub = old[(old["model_name"] == label)
                  & (old["stego_method"].isin(["Cover", method]))].copy()
        sub["score"] = sub["beta_hat"].astype(float)
        if len(sub):
            add(method, "committed-r4", "holdout", label,
                _rows_from_scores(sub, label))

    # anchor recipe: fresh leak-free sweeps per fold, pooled; plus
    # in-sample contrast
    for method in ("LSBR", "HILLR"):
        hold_frames, ins_frames, runs = [], [], []
        for fold, zoo, eval_split, train_split in FOLD_SPECS:
            run = _anchor_run(zoo, method)
            if run is None:
                print(f"sweep: no anchor run for {fold} {method}; skipped")
                continue
            runs.append(f"{fold}:{run}")
            hold_frames.append(_sweep(zoo, method, run, eval_split))
            ins_frames.append(_sweep(zoo, method, run, train_split))
        if hold_frames:
            pooled = pd.concat(hold_frames).reset_index(drop=True)
            add(method, "anchor-r5", "holdout", " + ".join(runs),
                _rows_from_scores(pooled, "UNet-anchor"))
        if ins_frames:
            pooled = pd.concat(ins_frames).reset_index(drop=True)
            add(method, "anchor-r5", "in-sample", " + ".join(runs),
                _rows_from_scores(pooled, "UNet-anchor"))

    df = pd.DataFrame(rows)
    CSV_OUT.parent.mkdir(parents=True, exist_ok=True)
    df.to_csv(CSV_OUT, index=False)
    print(df.to_string())
    return df


def publish(df):
    def cell(method, recipe, kind):
        r = df[(df.stego_method == method) & (df.recipe == recipe)
               & (df.eval_kind == kind)]
        if not len(r):
            return None
        r = r.iloc[0]
        return (f"| {method} | {recipe} | {kind} | {r.auc:.3f} | "
                f"[{r.auc_lo:.2f}, {r.auc_hi:.2f}] | {r.p_e:.3f} | "
                f"{r.auc_a001:.3f} |")

    lines = [c for c in (
        cell("LSBR", "committed-r4", "holdout"),
        cell("LSBR", "anchor-r5", "holdout"),
        cell("LSBR", "anchor-r5", "in-sample"),
        cell("HILLR", "committed-r4", "holdout"),
        cell("HILLR", "anchor-r5", "holdout"),
        cell("HILLR", "anchor-r5", "in-sample"),
    ) if c]

    new = df[(df.stego_method == "LSBR") & (df.recipe == "anchor-r5")
             & (df.eval_kind == "holdout")]
    old = df[(df.stego_method == "LSBR") & (df.recipe == "committed-r4")
             & (df.eval_kind == "holdout")]
    verdict = "pending — anchor runs not yet swapped"
    if len(new) and len(old):
        d = float(new.auc.iloc[0]) - float(old.auc.iloc[0])
        if float(new.auc.iloc[0]) >= 0.75:
            verdict = (f"the anchor recipe reaches {float(new.auc.iloc[0]):.3f} "
                       f"pooled holdout LSBR ({d:+.3f} vs the r4 recipe), "
                       f"meeting the r4 target (>= 0.75)")
        elif d > 0.03:
            verdict = (f"the anchor recipe improves the row to "
                       f"{float(new.auc.iloc[0]):.3f} ({d:+.3f}) but stays "
                       f"short of golden 0.867 — consistent with the same "
                       f"data bound documented for B0 (docs/B0_DATA_BOUND.md)")
        else:
            verdict = (f"the anchor recipe moves the row by only {d:+.3f} "
                       f"(to {float(new.auc.iloc[0]):.3f}): the gap does not "
                       f"close by recipe, consistent with a data bound — "
                       f"see the in/out-of-sample contrast below and "
                       f"docs/B0_DATA_BOUND.md")

    hdr = ("| method | recipe | eval | AUC | AUC 95% CI | P_E | "
           "AUC (α=0.01) |\n|---|---|---|---|---|---|---|")
    doc = f"""# WS-UNet recipe sweep: reference-anchor recipe vs the r4 rows

The round-4 holdout WS-UNet row was **0.633** pooled LSBR vs golden
**0.867** (reference `results/detection/auc_0.01.csv:5`), with no
recipe-vs-data analysis.  Round 5 pre-committed (scripts/round5_chain.py,
before any holdout score existed) the closest recoverable approximation
of the recipe that produced the golden checkpoints — the **reference
anchor**: `loss_lambda = 0.25` weighted l1ws
(`2*(0.25*L1 + 0.75*WS)`, the form every shipped UNet config records;
reference `models/unet/LSBR/240222160214-*/config.json`,
`src/_defs/losses.py:117`), crop-320 pretraining + a **full-resolution
512² fine-tune** (the anchor trained at 512², bs 16), cosine schedule,
end-of-schedule checkpoints, per the leak-free protocol
(`docs/EVAL_PROTOCOL.md`).

Context the reference sets: the golden UNet trained on **BOSS
(10,000 covers)**; these folds train on 2-3 fixture covers.

One pre-committed asymmetry, decided mid-round on measured wall-clock
(chain epoch rate ~60-95 s under host contention) and BEFORE any
anchor-recipe holdout score existed: fold A pretrains for 120 cosine
epochs (115 completed — the 06:38 UTC relay hang froze the trainer at
epoch 115/120 with val loss flat since ~epoch 105, and the best
checkpoint was accepted rather than repeating the 2 h stage), fold B
for 60; the 512² fine-tune stage is identical (scripts/round5_chain.py,
stage_unet_lsbr_foldb_w).  Neither schedule was selected by any
eval-cover score.

## Results

{hdr}
{chr(10).join(lines)}

`committed-r4` holdout scores are the exact per-image scores behind the
round-4 published table (snapshot:
`results/detection/unet_recipe_r4_scores.csv`); `anchor-r5` rows are
fresh leak-free sweeps of the swapped round-5 runs (fold A scored on
{{8,10}}, fold B on {{6,7,9}}, pooled).  The `in-sample` row scores each
fold's model on its own training covers — the UNET analogue of the
`docs/B0_DATA_BOUND.md` capacity check.

## Reading

{verdict}.

Generated by `scripts/round5_unet_sweep.py` into
`results/detection/unet_recipe_sweep.csv`.
"""
    DOC_OUT.write_text(doc)
    print(f"wrote {DOC_OUT}")


def main(cpu: bool = False):
    if cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    df = build()
    publish(df)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(cpu="--cpu" in sys.argv))
