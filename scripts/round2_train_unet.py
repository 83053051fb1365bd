"""Round-2 U-Net training recipes.

Targets (VERDICT round 1): pooled LSBR WS-UNet AUC >= 0.8667 with
beta_hat(0.4) ~= 0.199 (l1ws model), and a dropout model matching the
golden near-identity profile (val L1 ~= 0.30 gray levels, cover beta_hat
~= 0.006 — the reference's dropout model is a weak denoiser by design,
results/estimation/ws_dropout.csv + correlation.csv).
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
    select_metric="ws", val_steps=20,
)

DROPOUT = dict(
    network="unet_2", loss="l1", stego_method=None, alpha=None,
    drop_rate=0.1,
    crop=320, batch_size=12, augment=True,
    steps_per_epoch=120, num_epochs=120, patience=120,
    learning_rate=1e-4, lr_schedule="cosine",
    select_metric="loss", val_steps=20,
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
