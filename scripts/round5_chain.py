"""Round-5 training chain (VERDICT r4 items 3, 4, 5).

Stages (STAGES order; each prints resumable ``STAGE-DONE <tag>: <run>``
markers — sub-stages too — so ``--start N`` plus the markers resume a
killed chain without repeating finished hours):

  0 unet-lsbr-folda-w  reference-anchor UNet recipe, fold A (item 4):
                       l1ws with the anchor's RECORDED lambda form
                       2*(0.25*L1 + 0.75*WS) (train/losses.py
                       make_l1ws_weighted_per_image; the anchor config
                       models/unet/LSBR/240222160214-*/config.json
                       records loss_lambda=0.25 and trained at 512^2),
                       crop-320 pretraining + full-resolution 512^2
                       fine-tune.  RECIPE PRE-COMMITMENT: this recipe is
                       chosen from the reference anchor BEFORE any
                       holdout score of these runs exists, and the
                       published holdout row will use it regardless of
                       outcome (the old-recipe scores stay committed in
                       results/detection/scores_holdout.csv for the
                       sweep table) — model choice is never fitted to
                       the eval covers (docs/EVAL_PROTOCOL.md).
  1 unet-lsbr-foldb-w  same, fold B.
  2 abl-p16            plain-B0 committed curriculum on the 16-patch
                       256^2 cover set (item 3; data_ablation/p256,
                       scripts/round5_patches.py).
  3 unet-hillr-folda-w HILLR fine-tune of stage 0's final (item 5).
  4 unet-hillr-foldb-w HILLR fine-tune of stage 1's final (item 5).
  5 abl-p64            plain-B0 curriculum on the 64-patch 128^2 set.

UNet runs stage into models_r3/unet (gitignored scratch; the supervisor
swaps finished stages into the committed zoos immediately), ablation
runs into models_r3/b0_abl_p{256,128}.
"""
import pathlib
import shutil
import sys
import traceback

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.round2_train_b0 import COMMON               # noqa: E402
from scripts.round2_train_unet import L1WS               # noqa: E402
from scripts.round3_chain import (                       # noqa: E402
    DATA, FOLD_A, FOLD_B, FULLRES, UNET_OUT, _train_unet)

LOG = REPO / "logs/round5_chain.log"

# the anchor-recipe full-resolution fine-tune: short low-LR polish at the
# eval distribution (512^2, the resolution the anchor trained at)
FULLRES_FT = dict(crop=512, batch_size=4, steps_per_epoch=60,
                  num_epochs=25, learning_rate=2e-5, val_steps=20,
                  patience=999)


def _find_run(run: str):
    """Locate a run dir by name: gitignored staging first (full
    checkpoints for resume), then the committed zoos (survivors of a
    container reset; slimmed but resumable — 'best' params kept)."""
    for root in ("models_r3", "models", "models_foldb", "models_ablation"):
        hits = sorted((REPO / root).glob(f"**/{run}/config.json"))
        if hits:
            return hits[0].parent
    return None


def _done(tag: str):
    """Resume lookup: the newest STAGE-DONE marker for ``tag`` whose run
    still exists on disk — staging OR a committed zoo (container resets
    wipe models_r3, but the supervisor swaps finished stages into the
    committed zoos immediately).  Scans ALL surviving markers for the
    tag, not just the latest (ADVICE r4 on round4_chain2._done_marker)."""
    if not LOG.exists():
        return None
    for line in reversed(LOG.read_text().splitlines()):
        if line.startswith(f"STAGE-DONE {tag}: "):
            run = line.split(": ", 1)[1].strip()
            if _find_run(run) is not None:
                return run
    return None


def _mark(tag: str, run: str) -> str:
    print(f"STAGE-DONE {tag}: {run}", flush=True)
    return run


def _train_unet_name(cfg) -> str:
    """_train_unet returns the experiment dir Path; markers must carry
    the bare run NAME (the only form _find_run/_done can resolve — a
    full-path marker made the 07:32 incremental swap silently skip
    fold A)."""
    return pathlib.Path(_train_unet(cfg)).name


def unet_anchor(fold, tag):
    """Crop-320 pretraining under the anchor loss, then 512^2 fine-tune."""
    base = {**L1WS, **fold, "weighted_loss": True}
    s1 = _done(f"{tag}-s1") or _train_unet_name(base)
    _mark(f"{tag}-s1", s1)
    ft = _done(tag) or _train_unet_name({**base, **FULLRES_FT, "resume": s1})
    return _mark(tag, ft)


def _hillr_seed(tag_lsbr):
    """Copy the fold's finished LSBR-w run into the HILLR family dir so
    train_unet's in-family resume finds it (cf. round3_chain
    hillr_finetune)."""
    parent = _done(tag_lsbr)
    if parent is None:
        raise RuntimeError(f"stage {tag_lsbr} has no finished run")
    src = _find_run(parent)
    dst = UNET_OUT / "HILLR" / parent
    if not dst.exists():
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copytree(src, dst)
    return parent


def unet_hillr(fold, tag, tag_lsbr, s1_epochs=60, ft_epochs=15):
    parent = _hillr_seed(tag_lsbr)
    base = {**L1WS, **fold, "weighted_loss": True, "stego_method": "HILLR"}
    s1 = _done(f"{tag}-s1") or _train_unet_name(
        {**base, "num_epochs": s1_epochs, "learning_rate": 5e-5,
         "resume": parent})
    _mark(f"{tag}-s1", s1)
    ft = _done(tag) or _train_unet_name(
        {**base, **FULLRES_FT, "num_epochs": ft_epochs, "resume": s1})
    return _mark(tag, ft)


def patch_curriculum(patch: int, tag: str):
    """The committed plain-B0 curriculum (round4_ablation.stage_train,
    byte-for-byte hyperparameters) with ONLY the training cover set
    swapped for the n-patch dataset.  Crops cap at the patch size
    (train_b0.random_crop is a no-op when crop >= image), so the config
    surface stays mechanically identical."""
    from wsunet_tpu.train.train_b0 import train as train_b0

    droot = REPO / f"data_ablation/p{patch}"
    staging = REPO / f"models_r3/b0_abl_p{patch}"
    base = {**COMMON, "parity_features": True, "select_metric": "last",
            "stego_method": "LSBR", "tr_csv": str(droot / "split_tr.csv"),
            "va_csv": str(droot / "split_va.csv")}

    def _t(cfg):
        return train_b0(cfg, droot, staging).name

    s1 = _done(f"{tag}-s1") or _t({**base, "alpha": [0.4, 0.2, 0.1],
                                   "val_alpha": [0.1], "num_epochs": 40})
    _mark(f"{tag}-s1", s1)
    s2 = _done(f"{tag}-s2") or _t(
        {**base, "alpha": [0.1, 0.05, 0.01],
         "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 50,
         "learning_rate": 1e-4, "resume": s1})
    _mark(f"{tag}-s2", s2)
    s3 = _done(f"{tag}-s3") or _t(
        {**base, **FULLRES, "alpha": [0.1, 0.05, 0.01],
         "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 15,
         "learning_rate": 3e-5, "resume": s2})
    _mark(f"{tag}-s3", s3)
    recal = _done(f"{tag}-recal")
    if not recal:
        from scripts.bn_recalibrate import recalibrate
        recal = recalibrate(staging, "LSBR", s3, num_batches=80,
                            batch_size=4).name
    _mark(f"{tag}-recal", recal)
    final = _done(tag) or _t(
        {**base, **FULLRES, "freeze_bn": True,
         "alpha": [0.1, 0.05, 0.01], "val_alpha": [0.1, 0.05, 0.01],
         "num_epochs": 10, "learning_rate": 2e-5, "resume": recal})
    return _mark(tag, final)


def stage_unet_lsbr_folda_w():
    unet_anchor(FOLD_A, "unet-lsbr-folda-w")


def stage_unet_lsbr_foldb_w():
    # TIME-BUDGET TRIM (decided 2026-08-19 04:50 UTC, revised 06:15,
    # BEFORE any anchor-recipe holdout score existed — the recipe
    # pre-commitment above is about not fitting model choice to the
    # eval covers, and a budget trim made score-blind keeps that
    # property): the measured epoch rate under host-pipeline contention
    # is ~95 s, so a second full 120-epoch pretrain does not fit the
    # round.  Fold B pretrains for 60 cosine epochs instead of fold A's
    # 120; the 512^2 fine-tune is identical.  Recorded in
    # docs/UNET_RECIPE_SWEEP.md.
    unet_anchor({**FOLD_B, "num_epochs": 60}, "unet-lsbr-foldb-w")


def stage_abl_p16():
    patch_curriculum(256, "abl-p16")


def stage_unet_hillr_folda_w():
    # TIME-BUDGET TRIM (decided 2026-08-19 ~08:50 UTC, score-blind — no
    # holdout score of any round-5 run has been read): the projected
    # fold-B finish (~11:40) leaves ~60 min before the 12:40 cutoff; at
    # the measured ~75 s/epoch under host contention, the committed
    # 60+15-epoch HILLR fine-tune cannot finish, so it runs 40+10.  A
    # one-shot watcher (scripts/round5_hillr_watch.py) bounces the chain
    # at the fold-B boundary so this trimmed schedule is actually loaded.
    unet_hillr(FOLD_A, "unet-hillr-folda-w", "unet-lsbr-folda-w",
               s1_epochs=40, ft_epochs=10)


def stage_unet_hillr_foldb_w():
    unet_hillr(FOLD_B, "unet-hillr-foldb-w", "unet-lsbr-foldb-w")


def stage_abl_p64():
    patch_curriculum(128, "abl-p64")


# ORDER (re-planned 2026-08-19 ~04:50 UTC, revised 06:15, against
# measured stage costs: UNet anchor stage ~2.2-3 h under host-pipeline
# contention, B0 patch curriculum ~1-1.3 h, and only ~2 h of chain
# budget left after fold A): both ablation stages run before fold B so
# VERDICT item 3 gets its FULL n-axis (n in {2,3,4,16,64}) even though
# the tail of the chain is cut — item 4 still lands through fold A's
# anchor rows + the sweep/bound doc (scripts/round5_unet_sweep.py
# handles a missing fold B).  HILLR fine-tunes remain last: they depend
# on the LSBR folds and are the explicit sacrifice when the clock runs
# out (VERDICT item 5's fallback is the documented negative result +
# the KB-sca selection-channel-aware row, docs/SCA_WS.md).
STAGES = [stage_unet_lsbr_folda_w, stage_abl_p16, stage_abl_p64,
          stage_unet_lsbr_foldb_w,
          stage_unet_hillr_folda_w, stage_unet_hillr_foldb_w]

TERMINAL = ["unet-lsbr-folda-w", "abl-p16", "abl-p64",
            "unet-lsbr-foldb-w",
            "unet-hillr-folda-w", "unet-hillr-foldb-w"]


def main(start: int = 0) -> int:
    for i, stage in enumerate(STAGES[start:], start):
        print(f"CHAIN-STAGE {i} {stage.__name__}", flush=True)
        try:
            stage()
        except Exception:
            traceback.print_exc()
            print(f"CHAIN-ABORT stage {i}", flush=True)
            return 1
    print("CHAIN-END", flush=True)
    return 0


if __name__ == "__main__":
    start = 0
    if "--start" in sys.argv:
        start = int(sys.argv[sys.argv.index("--start") + 1])
    raise SystemExit(main(start))
