"""Round-2 training chain, part 3.

Findings that shaped it (see logs/ + PROGRESS):
- GroupNorm B0 cannot learn the task at all (per-image mean removal
  erases the first-order stego statistic; 15 epochs pinned at ln 2).
- BN *recalibration* at the eval distribution fixed the nsr detector
  outright: LSBR AUC 0.80 -> 0.920 (= golden).  The plain detector's
  train-mode signal was the contrastive batch-stat shortcut (recal only
  0.60 -> 0.63), so it gets a freeze-BN fine-tune: training against the
  frozen population statistics leaves per-image features as the only way
  to reduce the loss.

Stages: UNet HILLR -> UNet dropout -> plain freeze-BN ft (rate
curriculum, then eval-resolution) -> nsr freeze-BN polish.

Usage: python scripts/round2_chain3.py [start_stage]
"""
import pathlib
import sys
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from wsunet_tpu.train.train_b0 import train as train_b0
from wsunet_tpu.train.train_unet import train as train_unet
from scripts.round2_train_b0 import COMMON, NSR
from scripts.round2_train_unet import L1WS, DROPOUT

DATA = pathlib.Path("/root/reference/data")
B0_OUT = pathlib.Path("models_r2/b0")
UNET_OUT = pathlib.Path("models_r2/unet")

NSR_RECAL = ("260816210754-tpu-b0-nostride-alpha_mix0.1-0.05-0.01"
             "_grayscale_crossentropy_lr_3e-05_dr_0.2-bnrecal")
PLAIN_RECAL = ("260816203958-tpu-b0-alpha_mix0.4-0.2-0.1"
               "_grayscale_crossentropy_lr_0.0003_dr_0.2-bnrecal")

PLAIN = {**COMMON, "parity_features": True, "freeze_bn": True}
FULLRES = dict(crop=512, batch_size=2, steps_per_epoch=60, val_steps=30,
               select_metric="p_e", patience=999)

_plain_s1 = []


def stage_unet_hillr():
    cfg = {**L1WS, "stego_method": "HILLR", "num_epochs": 80, "patience": 80}
    print("STAGE-DONE unet-hillr:", train_unet(cfg, DATA, UNET_OUT),
          flush=True)


def stage_unet_dropout():
    cfg = {**DROPOUT, "num_epochs": 80, "patience": 80}
    print("STAGE-DONE unet-dropout:", train_unet(cfg, DATA, UNET_OUT),
          flush=True)


def stage_plain_ft():
    s1 = train_b0({**PLAIN, "alpha": [0.4, 0.2, 0.1], "val_alpha": [0.1],
                   "num_epochs": 25, "learning_rate": 1e-4,
                   "resume": PLAIN_RECAL}, DATA, B0_OUT)
    print("STAGE-DONE plain-ft-s1:", s1.name, flush=True)
    s2 = train_b0({**PLAIN, **FULLRES, "alpha": [0.1, 0.05, 0.01],
                   "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 15,
                   "learning_rate": 3e-5, "resume": s1.name}, DATA, B0_OUT)
    print("STAGE-DONE plain-ft-s2:", s2.name, flush=True)


def stage_nsr_polish():
    ft = train_b0({**COMMON, **NSR, **FULLRES, "freeze_bn": True,
                   "alpha": [0.1, 0.05, 0.01],
                   "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 10,
                   "learning_rate": 2e-5, "resume": NSR_RECAL},
                  DATA, B0_OUT)
    print("STAGE-DONE nsr-polish:", ft.name, flush=True)


STAGES = [stage_unet_hillr, stage_unet_dropout, stage_plain_ft,
          stage_nsr_polish]

if __name__ == "__main__":
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    for i, stage in enumerate(STAGES[start:], start):
        print(f"=== stage {i}: {stage.__name__} ===", flush=True)
        try:
            stage()
        except Exception:
            traceback.print_exc()
            print(f"STAGE-FAILED {stage.__name__}", flush=True)
