"""Round-4 training chain: finish the leak-free 2-fold holdout zoo.

Round 3 (scripts/round3_chain.py) completed stages 0-3 and the s1 leg of
hillr-b0-foldb before the round ended (VERDICT r3 "What's missing" 1/3).
This chain trains exactly what the pooled 5-cover holdout table still
lacks, in the order that completes detector rows soonest:

  0 hillr-b0-foldb-cont  resume the interrupted HILLR fine-tune from its
                         finished s1 checkpoint (STAGE-DONE
                         hillr-b0-foldb-s1 in logs/round3_stages1-4.log)
  1 plain-foldb          plain (parity-features) B0, covers {8,10} —
                         completes the plain-B0 row (fold A landed r3)
  2 nsr-folda            ns-r-B0 full curriculum, covers {6,7,9}, clean
                         val (cover 6) — replaces the excluded round-2
                         fold-A nsr whose checkpoint selection leaked
  3 hillr-b0-folda       HILLR fine-tune of the fold-A nsr final
  4 unet-hillr-foldb     l1ws HILLR UNet, covers {8,10}

STAGE-DONE tags match what scripts/round4_finish.py swaps; every run
uses select_metric="last" with val inside its own training fold (the
cleanliness rules of round3_chain.py's module docstring).
"""
import pathlib
import sys
import traceback

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.round2_train_b0 import COMMON, NSR            # noqa: E402
from scripts.round3_chain import (                         # noqa: E402
    FOLD_A, FOLD_B, FULLRES, _recalibrate, _train_b0, _train_unet,
    b0_curriculum, hillr_finetune, L1WS)

# finished by round 3 (logs/round3_stages1-4.log:1513)
HILLR_FOLDB_S1 = ("260817154710-tpu-b0-nostride-alpha_mix0.4-0.2-0.1"
                  "_grayscale_crossentropy_lr_0.0001_dr_0.2")


def stage_hillr_b0_foldb_cont():
    """Continue hillr_finetune(FOLD_B) from after its s1 leg; the s2/
    recal/final hyperparameters mirror round3_chain.hillr_finetune."""
    tag = "hillr-b0-foldb"
    base = {**COMMON, **NSR, **FOLD_B, "select_metric": "last",
            "stego_method": "HILLR"}
    s2 = _train_b0({**base, "alpha": [0.1, 0.05, 0.01],
                    "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 20,
                    "learning_rate": 5e-5, "resume": HILLR_FOLDB_S1})
    print(f"STAGE-DONE {tag}-s2: {s2}", flush=True)
    recal = _recalibrate("HILLR", s2)
    final = _train_b0({**base, **FULLRES, "freeze_bn": True,
                       "alpha": [0.1, 0.05, 0.01],
                       "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 8,
                       "learning_rate": 2e-5, "resume": recal})
    print(f"STAGE-DONE {tag}-final: {final}", flush=True)


def stage_plain_foldb():
    b0_curriculum(FOLD_B, {"parity_features": True}, "plain-foldb")


def stage_nsr_folda():
    b0_curriculum(FOLD_A, NSR, "nsr-folda")


def stage_hillr_b0_folda():
    hillr_finetune(FOLD_A, "hillr-b0-folda")


def stage_unet_hillr_foldb():
    cfg = {**L1WS, **FOLD_B, "stego_method": "HILLR",
           "num_epochs": 80, "patience": 80}
    exp = _train_unet(cfg)
    print(f"STAGE-DONE unet-hillr-foldb: {exp}", flush=True)


STAGES = [stage_hillr_b0_foldb_cont, stage_plain_foldb, stage_nsr_folda,
          stage_hillr_b0_folda, stage_unet_hillr_foldb]

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
