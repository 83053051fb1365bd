"""Round-2 B0 training recipe: one detector per reference variant, trained
over an embedding-rate mixture with crop-level sampling (the from-scratch
substitute for the reference's ImageNet warm start + per-alpha resume
curriculum, detector/models.py:42-63 / config.json "resume")."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from wsunet_tpu.train.train_b0 import train as train_b0

DATA = pathlib.Path("/root/reference/data")
OUT = pathlib.Path("models_r2/b0")

COMMON = dict(
    alpha=[0.4, 0.2, 0.1, 0.05, 0.01],
    crop=256, augment=True,
    steps_per_epoch=200, batch_size=8,
    learning_rate=3e-4, lr_schedule="cosine",
    num_epochs=80, patience=80,
    select_metric="p_e", val_alpha=[0.1, 0.05, 0.01], val_steps=25,
    stem_init="highpass", compute_dtype="float32",
)

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("nsr", "both"):
        e = train_b0({**COMMON, "no_stem_stride": True,
                      "lsbr_reference": True}, DATA, OUT)
        print("ns-r-B0 done:", e)
    if which in ("plain", "both"):
        e = train_b0(dict(COMMON), DATA, OUT)
        print("B0 done:", e)
