"""Round-2 training chain, part 2 (GroupNorm detectors + remaining UNets).

Round-2 part-1 findings drive this ordering:
- Both B0 variants suffer the BatchNorm train/eval statistics gap (plain
  collapses to chance at eval; nsr's val loss explodes to 7-30 while
  train-mode p_e is ~0.004, eval AUC 0.8 vs the 0.92 golden) -> retrain
  both with norm="group" (models/b0._make_norm) through the curriculum.
- The LSBR UNet recipe peaked well before 120 epochs (best real-protocol
  checkpoint at ~epoch 67; rank-AUC 0.967) -> HILLR/dropout run 80 epochs.

Usage: python scripts/round2_chain2.py [start_stage]
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

STAGE3 = dict(
    crop=512, batch_size=2, steps_per_epoch=60, val_steps=30,
    learning_rate=3e-5, lr_schedule="cosine", num_epochs=12,
    alpha=[0.1, 0.05, 0.01], val_alpha=[0.1, 0.05, 0.01],
    select_metric="p_e", patience=999,
)

_state = {}


def stage_b0_nsr_gn():
    gn = {**COMMON, **NSR, "norm": "group"}
    s1 = train_b0({**gn, "alpha": [0.4, 0.2, 0.1], "val_alpha": [0.1],
                   "num_epochs": 30}, DATA, B0_OUT)
    print("STAGE-DONE b0-nsr-gn-s1:", s1.name, flush=True)
    s2 = train_b0({**gn, "alpha": [0.1, 0.05, 0.01],
                   "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 40,
                   "learning_rate": 1e-4, "resume": s1.name}, DATA, B0_OUT)
    print("STAGE-DONE b0-nsr-gn-s2:", s2.name, flush=True)
    s3 = train_b0({**gn, **STAGE3, "resume": s2.name}, DATA, B0_OUT)
    print("STAGE-DONE b0-nsr-gn-s3:", s3.name, flush=True)


def stage_b0_plain_gn():
    gn = {**COMMON, "parity_features": True, "norm": "group"}
    s1 = train_b0({**gn, "alpha": [0.4, 0.2, 0.1], "val_alpha": [0.1],
                   "num_epochs": 30}, DATA, B0_OUT)
    print("STAGE-DONE b0-plain-gn-s1:", s1.name, flush=True)
    s2 = train_b0({**gn, "alpha": [0.1, 0.05, 0.01],
                   "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 40,
                   "learning_rate": 1e-4, "resume": s1.name}, DATA, B0_OUT)
    print("STAGE-DONE b0-plain-gn-s2:", s2.name, flush=True)


def stage_unet_hillr():
    cfg = {**L1WS, "stego_method": "HILLR", "num_epochs": 80, "patience": 80}
    print("STAGE-DONE unet-hillr:", train_unet(cfg, DATA, UNET_OUT),
          flush=True)


def stage_unet_dropout():
    cfg = {**DROPOUT, "num_epochs": 80, "patience": 80}
    print("STAGE-DONE unet-dropout:", train_unet(cfg, DATA, UNET_OUT),
          flush=True)


STAGES = [stage_b0_nsr_gn, stage_b0_plain_gn, stage_unet_hillr,
          stage_unet_dropout]

if __name__ == "__main__":
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    for i, stage in enumerate(STAGES[start:], start):
        print(f"=== stage {i}: {stage.__name__} ===", flush=True)
        try:
            stage()
        except Exception:
            traceback.print_exc()
            print(f"STAGE-FAILED {stage.__name__}", flush=True)
