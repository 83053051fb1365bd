"""Round-3 training chain: leak-free 2-fold holdout protocol.

VERDICT round-2 item 1: the committed headline numbers pool training
covers into the eval set.  The fix is a 2-fold cross-evaluation over the
5 fixture covers:

- fold A trains on covers {6,7,9} (the reference split_tr cover set;
  the stray stego-8 row in split_tr.csv is dropped by ``precovers``),
- fold B trains on covers {8,10},
- every model is scored ONLY on the covers its fold never saw, and the
  held-out scores are pooled into one 5-cover detection table
  (results/detection/*_holdout.csv, see wsunet_tpu/detect/holdout.py).

Cleanliness rules applied here (and why the round-2 ns-r-B0 is retrained
for BOTH folds): checkpoint selection is part of training, so every run
uses ``select_metric="last"`` (the end-of-schedule checkpoint — also the
measured round-2 winner) and validates on a cover from its own training
fold.  The committed round-2 ns-r-B0 chain selected checkpoints by val
P_E on cover 8, which is a fold-A *eval* cover; its fold-A model is
therefore rebuilt from scratch with val moved to cover 6.

Stages (STAGES order — kept in sync with the list at the bottom because
the chain resumes by numeric index, ADVICE r3; each stage prints
STAGE-DONE so ``python scripts/round3_chain.py <start_stage>`` resumes):
  0 unet-lsbr-foldb     l1ws UNet, covers {8,10}
  1 unet-lsbr-foldb-dr  same + KB-substitution dropout (the swapped one)
  2 nsr-foldb           ns-r-B0 full curriculum, covers {8,10}
  3 plain-folda         plain grayscale B0 (parity_features recipe)
  4 hillr-b0-foldb      HILLR fine-tune of the fold-B nsr detector
  5 nsr-folda           ns-r-B0 full curriculum, covers {6,7,9}, clean val
  6 unet-hillr-foldb    l1ws HILLR UNet, covers {8,10}
  7 plain-foldb         plain B0, covers {8,10}
(hillr-b0-folda ran in round 4 instead: scripts/round4_chain.py, which
also finished stages 4-7 after round 3 ended mid-stage-4.)

B0 curriculum per fold (the proven round-2 recipe, scripts/round2_*):
scratch s1 (rate mix .4/.2/.1, 40 ep) -> s2 (mix .1/.05/.01, 50 ep) ->
s3 eval-resolution (crop 512, 15 ep) -> BN recalibration at the eval
distribution (covers from the fold's own tr_csv) -> freeze-BN polish.
"""
import pathlib
import shutil
import sys
import traceback

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.round2_train_b0 import COMMON, NSR          # noqa: E402
from scripts.round2_train_unet import L1WS               # noqa: E402

DATA = pathlib.Path("/root/reference/data")
B0_OUT = REPO / "models_r3/b0"
UNET_OUT = REPO / "models_r3/unet"

FOLD_A = dict(tr_csv="split_tr.csv",
              va_csv=str(REPO / "splits/cover_6.csv"))
FOLD_B = dict(tr_csv=str(REPO / "splits/covers_8_10.csv"),
              va_csv=str(REPO / "splits/cover_10.csv"))

FULLRES = dict(crop=512, batch_size=2, steps_per_epoch=60, val_steps=30,
               patience=999)


def _train_b0(cfg):
    from wsunet_tpu.train.train_b0 import train
    exp = train(cfg, DATA, B0_OUT)
    return exp.name


def _train_unet(cfg):
    from wsunet_tpu.train.train_unet import train
    return train(cfg, DATA, UNET_OUT)


def _recalibrate(method, run_name):
    from scripts.bn_recalibrate import recalibrate
    return recalibrate(B0_OUT, method, run_name, num_batches=80,
                       batch_size=4).name


def b0_curriculum(fold, extra, tag, method="LSBR"):
    base = {**COMMON, **extra, **fold, "select_metric": "last",
            "stego_method": method}
    s1 = _train_b0({**base, "alpha": [0.4, 0.2, 0.1], "val_alpha": [0.1],
                    "num_epochs": 40})
    print(f"STAGE-DONE {tag}-s1: {s1}", flush=True)
    s2 = _train_b0({**base, "alpha": [0.1, 0.05, 0.01],
                    "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 50,
                    "learning_rate": 1e-4, "resume": s1})
    print(f"STAGE-DONE {tag}-s2: {s2}", flush=True)
    s3 = _train_b0({**base, **FULLRES, "alpha": [0.1, 0.05, 0.01],
                    "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 15,
                    "learning_rate": 3e-5, "resume": s2})
    print(f"STAGE-DONE {tag}-s3: {s3}", flush=True)
    recal = _recalibrate(method, s3)
    print(f"STAGE-DONE {tag}-recal: {recal}", flush=True)
    final = _train_b0({**base, **FULLRES, "freeze_bn": True,
                       "alpha": [0.1, 0.05, 0.01],
                       "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 10,
                       "learning_rate": 2e-5, "resume": recal})
    print(f"STAGE-DONE {tag}-final: {final}", flush=True)
    return final


def _newest_final(method="LSBR", fold_tr=None, nsr=True):
    """Newest freeze-BN run of the given fold (run names sort by time)."""
    import json
    runs = []
    for d in sorted((B0_OUT / method).iterdir()):
        cfgp = d / "config.json"
        if not cfgp.exists():
            continue
        cfg = json.loads(cfgp.read_text())
        if (cfg.get("freeze_bn") and cfg.get("no_stem_stride") == nsr
                and cfg.get("tr_csv") == fold_tr):
            runs.append(d.name)
    if not runs:
        raise RuntimeError(f"no freeze_bn run for fold {fold_tr}")
    return runs[-1]


def hillr_finetune(fold, tag, done=lambda tag: None):
    """HILLR-trained detector (VERDICT item 9): fine-tune the fold's
    LSBR nsr detector on HILLr embeddings (rate mixture), then freeze-BN
    polish.  The resume checkpoint is copied into the HILLR family dir
    because train_b0 resolves resumes within its own stego_method.

    ``done``: optional tag -> finished experiment name lookup (e.g.
    round4_chain2._done_marker) so a supervisor relaunch after a
    mid-stage death skips the hours-long finished sub-stages."""
    parent = _newest_final("LSBR", fold["tr_csv"], nsr=True)
    src = B0_OUT / "LSBR" / parent
    dst = B0_OUT / "HILLR" / parent
    if not dst.exists():
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copytree(src, dst)
    base = {**COMMON, **NSR, **fold, "select_metric": "last",
            "stego_method": "HILLR"}
    s1 = done(f"{tag}-s1") or _train_b0(
        {**base, "alpha": [0.4, 0.2, 0.1], "val_alpha": [0.1],
         "num_epochs": 15, "learning_rate": 1e-4, "resume": parent})
    print(f"STAGE-DONE {tag}-s1: {s1}", flush=True)
    s2 = done(f"{tag}-s2") or _train_b0(
        {**base, "alpha": [0.1, 0.05, 0.01],
         "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 20,
         "learning_rate": 5e-5, "resume": s1})
    print(f"STAGE-DONE {tag}-s2: {s2}", flush=True)
    recal = done(f"{tag}-recal") or _recalibrate("HILLR", s2)
    print(f"STAGE-DONE {tag}-recal: {recal}", flush=True)
    final = _train_b0({**base, **FULLRES, "freeze_bn": True,
                       "alpha": [0.1, 0.05, 0.01],
                       "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 8,
                       "learning_rate": 2e-5, "resume": recal})
    print(f"STAGE-DONE {tag}-final: {final}", flush=True)


def stage_unet_lsbr_foldb():
    exp = _train_unet({**L1WS, **FOLD_B})
    print(f"STAGE-DONE unet-lsbr-foldb: {exp}", flush=True)


def stage_unet_lsbr_foldb_dr():
    """Fold-B l1ws UNet with KB-substitution dropout.  The plain fold-B
    model (stage 0) carries a 0.05 WS bias on held-out cover 7 — with
    only two training covers the predictor overfits their textures.
    UniformDropout replaces random pixels with their KB prediction during
    training, regularizing toward the filter predictor on unfamiliar
    content (the round-2 dropout-UNet evidence).  Decision pre-committed
    on that evidence BEFORE evaluating this model's holdout scores, so
    model choice is not fitted to the eval covers."""
    exp = _train_unet({**L1WS, **FOLD_B, "drop_rate": 0.1})
    print(f"STAGE-DONE unet-lsbr-foldb-dr: {exp}", flush=True)


def stage_nsr_foldb():
    b0_curriculum(FOLD_B, NSR, "nsr-foldb")


def stage_nsr_folda():
    b0_curriculum(FOLD_A, NSR, "nsr-folda")


def stage_plain_folda():
    b0_curriculum(FOLD_A, {"parity_features": True}, "plain-folda")


def stage_hillr_b0_folda():
    hillr_finetune(FOLD_A, "hillr-b0-folda")


def stage_unet_hillr_foldb():
    cfg = {**L1WS, **FOLD_B, "stego_method": "HILLR",
           "num_epochs": 80, "patience": 80}
    exp = _train_unet(cfg)
    print(f"STAGE-DONE unet-hillr-foldb: {exp}", flush=True)


def stage_plain_foldb():
    b0_curriculum(FOLD_B, {"parity_features": True}, "plain-foldb")


def stage_hillr_b0_foldb():
    hillr_finetune(FOLD_B, "hillr-b0-foldb")


# Priority order after the stage-0 holdout diagnosis (see
# stage_unet_lsbr_foldb_dr).  The fold-A nsr retrain moved to the back:
# its holdout row comes from the fold-B model alone (covers {6,7,9},
# fully leak-free) when the clock runs out before stage 5.
STAGES = [stage_unet_lsbr_foldb, stage_unet_lsbr_foldb_dr,
          stage_nsr_foldb, stage_plain_folda, stage_hillr_b0_foldb,
          stage_nsr_folda, stage_unet_hillr_foldb, stage_plain_foldb]

if __name__ == "__main__":
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    stop = int(sys.argv[2]) if len(sys.argv) > 2 else len(STAGES)
    for i, stage in enumerate(STAGES[start:stop], start):
        print(f"=== stage {i}: {stage.__name__} ===", flush=True)
        try:
            stage()
        except Exception:
            traceback.print_exc()
            print(f"STAGE-FAILED {stage.__name__}", flush=True)
