"""Build the leak-free holdout detection tables (VERDICT r2 item 1).

Protocol (wsunet_tpu/detect/holdout.py): fold A models trained on covers
{6,7,9}, fold B models on covers {8,10}; every model is scored ONLY on
the other fold's covers and the pooled scores produce one 5-cover
detection table.  Fold-A models live in the primary zoo (models/), fold-B
models in models_foldb/ — both committed.

Writes results/detection/{auc,roc}_0.01_holdout.csv plus the per-image
scores_holdout.csv audit frame.  Run on TPU after scripts/round3_chain.py
winners are swapped in (scripts/round3_swap.py).
"""
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DATA = pathlib.Path("/root/reference/data")
SPLITS = REPO / "splits"

# (zoo, eval split, train split) per fold; eval split = the covers the
# fold's models never trained on.  The train split feeds eval-time-fitted
# detectors (OLS) so their taps stay inside the fold (VERDICT r3 item 4).
FOLD_ROOTS = [
    (REPO / "models", str(SPLITS / "covers_8_10.csv"),
     "split_tr.csv"),                                           # fold A
    (REPO / "models_foldb", str(SPLITS / "covers_6_7_9.csv"),
     str(SPLITS / "covers_8_10.csv")),                          # fold B
]


def _b0_entries(b0_root):
    """label -> spec for every trained B0 under <root>/b0/<method>."""
    from scripts.attest_checkpoints import is_leak_free
    from wsunet_tpu.cli import b0_label
    from wsunet_tpu.utils.registry import scan_models
    out = {}
    base = b0_root / "b0"
    if not base.exists():
        return out
    for mdir in sorted(base.iterdir()):
        if not mdir.is_dir():
            continue
        df = scan_models(base, mdir.name)
        for _, row in df.iterrows():
            with open(mdir / row["model_name"] / "config.json") as f:
                cfg = json.load(f)
            # Cleanliness guard: checkpoint selection is part of training,
            # so only end-of-schedule checkpoints qualify (declared via
            # select_metric="last" or md5-attested best==latest) — the
            # round-2 B0s were selected by val P_E on cover 8, a fold-A
            # EVAL cover, and must stay out of the holdout pool until
            # their fold is retrained (round3/round4 chains).
            if not is_leak_free(cfg):
                print(f"holdout: exclude {mdir.name}/{row['model_name']}"
                      " (checkpoint selection not leak-free)")
                continue
            label = b0_label(cfg)
            if label in out:
                # two qualifying runs with identical training configs
                # would silently shadow each other (ADVICE r3)
                raise RuntimeError(
                    f"duplicate holdout label {label!r}: "
                    f"{out[label]['model_name']} vs {row['model_name']}")
            out[label] = dict(
                model_dir=base, stego_method=mdir.name,
                model_name=row["model_name"],
                lsbr_reference=bool(cfg.get("lsbr_reference", False)))
    return out


def _unet_entries(unet_root):
    """label -> (method_dir, run_name) for trained U-Nets (LSBR ->
    golden label "UNet"; other methods -> "UNet_<method>").  Same
    cleanliness rule as _b0_entries (ADVICE r3 medium): a run enters the
    leak-free pool only with end-of-schedule checkpoint selection —
    declared (select_metric="last") or machine-attested
    (scripts/attest_checkpoints.py best==latest + patience covers the
    schedule); the committed fold-A runs predate select_metric="last"
    and carry the attestation block instead."""
    from scripts.attest_checkpoints import is_leak_free
    from wsunet_tpu.utils.registry import scan_models
    out = {}
    base = unet_root / "unet"
    if not base.exists():
        return out
    for method in ("LSBR", "HILLR"):
        df = scan_models(base, method)
        clean = []
        for name in sorted(df["model_name"]) if len(df) else []:
            with open(base / method / name / "config.json") as f:
                cfg = json.load(f)
            if is_leak_free(cfg):
                clean.append(name)
            else:
                print(f"holdout: exclude unet {method}/{name}"
                      " (checkpoint selection not leak-free)")
        if not clean:
            continue
        label = "UNet" if method == "LSBR" else f"UNet_{method}"
        out[label] = (base / method, clean[-1])
    return out


def build_folds():
    from wsunet_tpu.detect import Fold
    folds = []
    for root, eval_split, train_split in FOLD_ROOTS:
        folds.append(Fold(
            eval_split=eval_split,
            train_split=train_split,
            unets=_unet_entries(root),
            b0s=_b0_entries(root)))
    return folds


def main(results_dir=REPO / "results"):
    from wsunet_tpu.detect import holdout_roc
    folds = build_folds()
    for i, f in enumerate(folds):
        print(f"fold {i} (eval {f.eval_split}, train {f.train_split}):")
        for lbl, (path, name) in f.unets.items():
            print(f"  unet {lbl}: {path.name}/{name}")
        for lbl, spec in f.b0s.items():
            print(f"  b0   {lbl}: {spec['stego_method']}/"
                  f"{spec['model_name']}")
    df = holdout_roc(DATA, folds, results_dir=results_dir,
                     suffix="holdout", batch_size=8,
                     filter_models=("AVG", "KB", "KB-w", "KB-sca", "OLS"))
    print(df.to_string())


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    main()
