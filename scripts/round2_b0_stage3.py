"""B0 stage-3: eval-resolution fine-tune (crop 512, low LR).

Stages 1-2 train on random 256-crops; scoring happens on full 512x512
images, and the staged checkpoints saturate there (BatchNorm running
stats + feature scales never saw the eval resolution — stage-1 scores
everything 1.0 at 512).  This stage resumes from the stage-2 best and
fine-tunes at the eval resolution so BN statistics and the head match
the deployment input.

Usage: python scripts/round2_b0_stage3.py [nsr|plain] <resume_run_name>
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from wsunet_tpu.train.train_b0 import train as train_b0
from scripts.round2_train_b0 import COMMON, NSR

DATA = pathlib.Path("/root/reference/data")
OUT = pathlib.Path("models_r2/b0")

STAGE3 = dict(
    crop=512, batch_size=2, steps_per_epoch=60, val_steps=30,
    learning_rate=3e-5, lr_schedule="cosine", num_epochs=15,
    alpha=[0.1, 0.05, 0.01], val_alpha=[0.1, 0.05, 0.01],
    select_metric="p_e", patience=999,
)

if __name__ == "__main__":
    which, resume = sys.argv[1], sys.argv[2]
    variant = NSR if which == "nsr" else {"parity_features": True}
    exp = train_b0({**COMMON, **variant, **STAGE3, "resume": resume},
                   DATA, OUT)
    print(f"STAGE-DONE b0-{which}-s3:", exp.name, flush=True)
