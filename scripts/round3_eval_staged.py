"""Evaluate round-3 staged models (models_r3/) on their HELD-OUT covers.

Each staged run's fold is inferred from its config's tr_csv: fold-B runs
(tr=covers_8_10) are scored on covers {6,7,9} and vice versa.  Prints a
pooled AUC/P_E summary per run so swap decisions are grounded in the
leak-free protocol, not the (leaky) full-catalog sweep.

Usage: python scripts/round3_eval_staged.py [unet|b0|all] [name-substr]
"""
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DATA = pathlib.Path("/root/reference/data")
SPLITS = REPO / "splits"
R3 = REPO / "models_r3"

HOLDOUT_OF = {
    "split_tr.csv": str(SPLITS / "covers_8_10.csv"),
    str(SPLITS / "covers_8_10.csv"): str(SPLITS / "covers_6_7_9.csv"),
}


def eval_runs(family: str, substr: str = ""):
    from wsunet_tpu.detect import Fold, holdout_frames
    from wsunet_tpu.detect.roc import produce_roc
    base = R3 / family
    if not base.exists():
        return
    for mdir in sorted(base.iterdir()):
        for cfg_path in sorted(mdir.glob("*/config.json")):
            run = cfg_path.parent.name
            if substr and substr not in run:
                continue
            if not (cfg_path.parent / "model" / "best").exists():
                continue
            cfg = json.loads(cfg_path.read_text())
            split = HOLDOUT_OF.get(cfg.get("tr_csv"))
            if split is None:
                print(f"skip {run}: unknown fold {cfg.get('tr_csv')}")
                continue
            # evaluate on the run's own training method (plus LSBR for
            # HILLR-trained detectors, mirroring the reference sweep)
            method = mdir.name if mdir.name != "dropout" else "LSBR"
            if family == "unet":
                fold = Fold(eval_split=split,
                            unets={"M": (mdir, run)})
            else:
                fold = Fold(eval_split=split, b0s={"M-B0": dict(
                    model_dir=base, stego_method=mdir.name,
                    model_name=run,
                    lsbr_reference=cfg.get("lsbr_reference", False))})
            frames = holdout_frames(
                DATA, [fold], filter_models=(),
                stego_methods=(method,) if method == "LSBR"
                else (method, "LSBR"))
            roc = produce_roc(frames)
            summary = roc[["stego_method", "model_name", "auc", "p_e"]
                          ].drop_duplicates()
            print(f"== {family}/{mdir.name}/{run} (holdout {split})")
            print(summary.to_string(index=False), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    substr = sys.argv[2] if len(sys.argv) > 2 else ""
    if which in ("unet", "all"):
        eval_runs("unet", substr)
    if which in ("b0", "all"):
        eval_runs("b0", substr)
