"""ns-r-B0 sub-chance holdout diagnosis (VERDICT r4 item 2).

The published holdout table shows ns-r-B0 at AUC 0.333 LSBR / 0.300
HILLR — below chance.  The verdict asked: score inversion, fold-mismatched
BN recalibration, wrong reference plane, or genuine small-n
anti-generalization?  This script produces the committed evidence
(results/detection/nsr_diagnosis.csv): each fold's ns-r-B0 scored over
the FULL cover catalog (its own training covers AND the unseen ones) at
α ∈ {0.1, 0.05, 0.01}, plus a per-(model, cover) within-cover ordering
summary.  docs/NSR_HOLDOUT_DIAGNOSIS.md reads the verdict off this CSV.

Runs on whatever jax.devices() gives; pass --cpu to pin the CPU backend
(used mid-round while the chain owns the TPU).
"""
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DATA = pathlib.Path("/root/reference/data")
OUT = REPO / "results/detection/nsr_diagnosis.csv"

# fold -> (zoo, training covers)
FOLDS = {"foldA": (REPO / "models", "{6,7,9}"),
         "foldB": (REPO / "models_foldb", "{8,10}")}
ALPHAS = [0.1, 0.05, 0.01]


def _nsr_run(zoo: pathlib.Path):
    import json
    base = zoo / "b0" / "LSBR"
    for cfgp in sorted(base.glob("*/config.json")):
        cfg = json.loads(cfgp.read_text())
        if cfg.get("no_stem_stride") and cfg.get("lsbr_reference"):
            return cfgp.parent.name
    return None


def main(cpu: bool = False) -> int:
    if cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import pandas as pd
    from wsunet_tpu.detect.b0_eval import run as b0_run

    frames = []
    for fold, (zoo, train_covers) in FOLDS.items():
        run_name = _nsr_run(zoo)
        if run_name is None:
            print(f"{fold}: no ns-r run; skipped")
            continue
        df = b0_run(DATA, zoo / "b0", "LSBR", eval_methods=("LSBR",),
                    model_name=run_name, lsbr_reference=True,
                    batch_size=8)
        df = df[df["alpha"].isna() | df["alpha"].isin(ALPHAS)].copy()
        df["fold"] = fold
        df["run"] = run_name
        df["train_covers"] = train_covers
        df["cover"] = df["name"].str.extract(r"(\d+)\.png$")
        df["in_sample"] = df["cover"].apply(
            lambda c: c in train_covers.strip("{}").split(","))
        frames.append(df)
    out = pd.concat(frames).reset_index(drop=True)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    cols = ["fold", "run", "train_covers", "cover", "in_sample", "name",
            "stego_method", "alpha", "output"]
    out[cols].to_csv(OUT, index=False)

    # within-cover ordering summary: does score(stego at alpha) exceed
    # score(of the same cover), per (fold, cover)?
    print("\nwithin-cover orderings (score_stego > score_cover):")
    for (fold, cover), g in out.groupby(["fold", "cover"]):
        base = g[g["alpha"].isna()]["output"].iloc[0]
        wins = int((g[g["alpha"].notna()]["output"] > base).sum())
        ties = int((g[g["alpha"].notna()]["output"] == base).sum())
        tag = "train" if g["in_sample"].iloc[0] else "UNSEEN"
        print(f"  {fold} cover {cover} [{tag}]: {wins}/{len(ALPHAS)} "
              f"above cover (ties {ties}); cover score {base:.6f}")
    print(f"\nwrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(cpu="--cpu" in sys.argv))
