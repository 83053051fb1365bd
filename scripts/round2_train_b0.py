"""Round-2 B0 training recipes (v3: quadratic stem + rate curriculum).

The from-scratch substitute for the reference's ImageNet warm start
(detector/models.py:42-63): the separating statistic for LSBr is the
per-pixel WS product (cover LSB planes are themselves near-random), so
the detector gets a quadratic stem whose products start as LSB x residual
planes, then a two-stage rate curriculum mirrors the reference's
resume-from-higher-alpha convention (config.json "resume").

Usage: python scripts/round2_train_b0.py [pilot|nsr|plain|all]
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from wsunet_tpu.train.train_b0 import train as train_b0

DATA = pathlib.Path("/root/reference/data")
OUT = pathlib.Path("models_r2/b0")

COMMON = dict(
    crop=256, augment=True, steps_per_epoch=150, batch_size=8,
    learning_rate=3e-4, lr_schedule="cosine", select_metric="p_e",
    val_steps=25, stem_init="highpass", quadratic_stem=True,
    compute_dtype="float32", patience=999,
)

NSR = dict(no_stem_stride=True, lsbr_reference=True)


def run_stage(cfg):
    exp = train_b0(cfg, DATA, OUT)
    return exp.name


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "pilot":
        # quick click-check: easy rates only, short
        run_stage({**COMMON, **NSR, "alpha": [0.4, 0.2], "val_alpha": [0.2],
                   "num_epochs": 10})
    if which in ("nsr", "all"):
        s1 = run_stage({**COMMON, **NSR, "alpha": [0.4, 0.2, 0.1],
                        "val_alpha": [0.1], "num_epochs": 40})
        print("nsr stage1:", s1, flush=True)
        s2 = run_stage({**COMMON, **NSR, "alpha": [0.1, 0.05, 0.01],
                        "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 50,
                        "learning_rate": 1e-4, "resume": s1})
        print("nsr stage2:", s2, flush=True)
    if which in ("plain", "all"):
        # plain grayscale input: the parity statistic is unreachable for a
        # conv stem (sawtooth in intensity), so the model-side periodic
        # featurization stands in (models/b0.py parity_features)
        # norm="group": BN batch statistics normalize contrastively over
        # the in-batch cover/stego pairs, a signal that evaporates under
        # eval-time running averages (observed: train p_e 0.31, eval at
        # chance).  Per-image group stats keep train and eval identical.
        plain = {**COMMON, "parity_features": True, "norm": "group"}
        s1 = run_stage({**plain, "alpha": [0.4, 0.2, 0.1],
                        "val_alpha": [0.1], "num_epochs": 40})
        print("plain stage1:", s1, flush=True)
        s2 = run_stage({**plain, "alpha": [0.1, 0.05, 0.01],
                        "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 50,
                        "learning_rate": 1e-4, "resume": s1})
        print("plain stage2:", s2, flush=True)
