"""Train the full model zoo on the fixture dataset (TPU).

Produces the same experiment tree the reference ships metadata for
(models/unet/{LSBR,dropout,HILLR}, models/b0/LSBR/...), so every
model-dependent path (unet-eval, roc with UNet, saliency, contour,
correlation) runs out of the box.  The fixture has only 3 training
covers; random 256x256 crops + flips/rot90 + on-device embedding make
that statistically workable for a *local* pixel predictor, but these are
demo-scale checkpoints — reference-grade AUC parity at low alpha needs
the BOSS corpus the reference trained on (not shipped).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

DATA = pathlib.Path("/root/reference/data")
REPO = pathlib.Path(__file__).resolve().parent.parent


def main():
    from wsunet_tpu.train.train_unet import train as train_unet
    from wsunet_tpu.train.train_b0 import train as train_b0

    unet_common = dict(
        network="unet_2", crop=256, augment=True, steps_per_epoch=40,
        batch_size=16, num_epochs=200, patience=20, learning_rate=1e-4,
    )
    runs = [
        ("unet", dict(unet_common, stego_method="LSBR", alpha=0.4,
                      loss="l1ws")),
        ("unet", dict(unet_common, stego_method=None, alpha=None,
                      loss="l1", drop_rate=0.1)),
        ("unet", dict(unet_common, stego_method="HILLR", alpha=0.4,
                      loss="l1ws")),
    ]
    b0_common = dict(
        batch_size=8, num_epochs=60, patience=10, learning_rate=1e-4,
        shape=(512, 512), compute_dtype="bfloat16",
    )
    b0_runs = [
        dict(b0_common, stego_method="LSBR", alpha=0.4),
        dict(b0_common, stego_method="LSBR", alpha=0.4,
             no_stem_stride=True, lsbr_reference=True),
    ]

    for kind, cfg in runs:
        print(f"=== training unet: {cfg.get('stego_method')} "
              f"{cfg.get('loss')} ===", flush=True)
        exp = train_unet(cfg, data_path=DATA, output_dir=REPO / "models/unet")
        print("done:", exp, flush=True)

    for cfg in b0_runs:
        print(f"=== training b0: ns={cfg.get('no_stem_stride', False)} "
              f"r={cfg.get('lsbr_reference', False)} ===", flush=True)
        exp = train_b0(cfg, data_path=DATA, output_dir=REPO / "models/b0")
        print("done:", exp, flush=True)


if __name__ == "__main__":
    main()
