"""Round-2 training chain driver (resumable).

Runs the remaining round-2 training stages sequentially on the one TPU
chip, skipping stages whose run directory already has a best checkpoint
with a completed marker in logs.  Stage list:

  1. B0 nsr stage-2   (low-alpha fine-tune, resume from committed stage-1)
  2. B0 plain stage-1 + stage-2 (periodic parity featurization)
  3. UNet LSBR l1ws   (round-2 recipe)
  4. UNet HILLR l1ws
  5. UNet dropout l1

Usage: python scripts/round2_chain.py [start_stage]
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

NSR_S1 = ("260816151645-tpu-b0-nostride-alpha_mix0.4-0.2-0.1"
          "_grayscale_crossentropy_lr_0.0003_dr_0.2")


def stage_b0_nsr_s2():
    exp = train_b0({**COMMON, **NSR, "alpha": [0.1, 0.05, 0.01],
                    "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 50,
                    "learning_rate": 1e-4, "resume": NSR_S1},
                   DATA, B0_OUT)
    print("STAGE-DONE b0-nsr-s2:", exp.name, flush=True)


def stage_b0_plain():
    plain = {**COMMON, "parity_features": True}
    s1 = train_b0({**plain, "alpha": [0.4, 0.2, 0.1], "val_alpha": [0.1],
                   "num_epochs": 40}, DATA, B0_OUT)
    print("STAGE-DONE b0-plain-s1:", s1.name, flush=True)
    s2 = train_b0({**plain, "alpha": [0.1, 0.05, 0.01],
                   "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 50,
                   "learning_rate": 1e-4, "resume": s1.name}, DATA, B0_OUT)
    print("STAGE-DONE b0-plain-s2:", s2.name, flush=True)


def stage_unet_lsbr():
    print("STAGE-DONE unet-lsbr:", train_unet(dict(L1WS), DATA, UNET_OUT),
          flush=True)


def stage_unet_hillr():
    print("STAGE-DONE unet-hillr:", train_unet(
        {**L1WS, "stego_method": "HILLR"}, DATA, UNET_OUT), flush=True)


def stage_unet_dropout():
    print("STAGE-DONE unet-dropout:", train_unet(dict(DROPOUT), DATA,
                                                 UNET_OUT), flush=True)


STAGES = [stage_b0_nsr_s2, stage_b0_plain, stage_unet_lsbr,
          stage_unet_hillr, stage_unet_dropout]

if __name__ == "__main__":
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    for i, stage in enumerate(STAGES[start:], start):
        print(f"=== stage {i}: {stage.__name__} ===", flush=True)
        try:
            stage()
        except Exception:
            traceback.print_exc()
            print(f"STAGE-FAILED {stage.__name__}", flush=True)
