"""Evaluate round-2 staged models (models_r2/) before swapping them in.

Prints pooled detection AUC/P_E (alphas .1/.05/.01, the golden
auc_0.01.csv protocol) for each staged detector / UNet so the swap
decision is grounded.  Usage:

    python scripts/round2_eval.py [b0|unet|all]
"""
import pathlib
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

DATA = pathlib.Path("/root/reference/data")
ALPHAS = [0.1, 0.05, 0.01]


def newest_b0_run(model_dir, ns, ref):
    """Newest matching run (timestamp-prefixed names sort lexically) —
    the staged tree holds both curriculum stages, so the registry's
    unique-match rule can't be used directly."""
    from wsunet_tpu.utils.registry import scan_models
    df = scan_models(model_dir, "LSBR")
    if not len(df):
        return None
    df = df[(df.no_stem_stride == ns) & (df.lsbr_reference == ref)]
    if not len(df):
        return None
    return sorted(df["model_name"])[-1]


def eval_b0(model_dir):
    from wsunet_tpu.detect import b0_run, produce_roc
    out = []
    for ns, ref in [(True, True), (False, False)]:
        name = newest_b0_run(model_dir, ns, ref)
        if name is None:
            print(f"skip ns={ns} r={ref}: no staged run")
            continue
        print(f"-- run {name}")
        try:
            res = b0_run(DATA, model_dir, "LSBR", model_name=name,
                         no_stem_stride=ns, lsbr_reference=ref,
                         batch_size=8)
        except (RuntimeError, FileNotFoundError) as e:
            print(f"skip ns={ns} r={ref}: {e}")
            continue
        prefix = ("ns-" if ns else "") + ("r-" if ref else "")
        res = res[(res["stego_method"].isna()) |
                  (res["alpha"].isin(ALPHAS))].copy()
        res["model_name"] = f"{prefix}B0"
        res["score"] = res["output"]
        res["stego_method"] = res["stego_method"].fillna("Cover")
        res["alpha"] = res["alpha"].fillna(0.0)
        roc = produce_roc(res)
        summary = roc[["stego_method", "model_name", "auc", "p_e"]
                      ].drop_duplicates()
        print(summary.to_string(index=False))
        out.append(summary)
    return out


def eval_unet(model_dir, train_method="LSBR"):
    """Pooled detection AUC/P_E for a staged UNet.

    train_method "LSBR"/"HILLR": detection of that stego method at the
    golden alphas + beta_hat(0.4) parity check.  "dropout": the golden
    profile is a near-identity denoiser (ws_dropout.csv: cover beta_hat
    ~0.0025-0.02, l1 ~0.3 gray levels) — report those instead of AUC."""
    from wsunet_tpu.detect import produce_roc
    from wsunet_tpu.ws import ws_run
    from wsunet_tpu.utils.registry import get_model_name
    name = get_model_name(model_dir, train_method)
    print(f"-- run {name}")
    kw = dict(model_name=name, model_path=model_dir / train_method,
              weighted=0, batch_size=8)
    if train_method == "dropout":
        from wsunet_tpu.ws.unet_eval import run as unet_run
        # eval_methods=() -> covers only; every row is a cover
        cov = unet_run(DATA, model_dir, "dropout", eval_methods=())
        print("cover beta_hat:", np.round(cov["beta_hat"].to_numpy(), 4),
              "\ncover l1 (gray levels):",
              np.round(cov["l1"].to_numpy(), 3),
              "\n(golden ws_dropout.csv: beta 0.0025-0.02, l1 ~0.3)")
        return
    sm = train_method
    frames = []
    for method in [None, sm]:
        for alpha in (ALPHAS if method else [None]):
            frames.append(ws_run(input_dir=DATA, stego_method=method,
                                 alpha=alpha, **kw))
    res = pd.concat(frames).reset_index(drop=True)
    res["stego_method"] = res["stego_method"].fillna("Cover")
    res["alpha"] = res["alpha"].fillna(0.0)
    roc = produce_roc(res)
    print(roc[["stego_method", "model_name", "auc", "p_e"]
              ].drop_duplicates().to_string(index=False))
    b04 = ws_run(input_dir=DATA, stego_method=sm, alpha=0.4, **kw)
    print("beta_hat(0.4) mean:", round(float(
        np.nanmean(b04["beta_hat"])), 4),
        "(golden ~0.199 for LSBR)" if sm == "LSBR" else "")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    root = pathlib.Path("models_r2/unet")
    if which in ("b0", "all"):
        print("== staged B0 (models_r2/b0) ==")
        eval_b0(pathlib.Path("models_r2/b0"))
    if which in ("unet", "lsbr", "all"):
        print("== staged UNet LSBR ==")
        eval_unet(root, "LSBR")
    if which in ("hillr", "all") and (root / "HILLR").exists():
        print("== staged UNet HILLR ==")
        eval_unet(root, "HILLR")
    if which in ("dropout", "all") and (root / "dropout").exists():
        print("== staged UNet dropout ==")
        eval_unet(root, "dropout")
