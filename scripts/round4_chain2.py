"""Round-4 chain, part 2: resume after the TPU tunnel outage.

At 19:53 the axon relay (the host-side process every TPU RPC rides
through) closed and `scripts/round4_chain.py` hung forever in a futex
wait inside nsr-folda-s2 (epoch 27/50, latest checkpoint saved 19:53).
This runner finishes the remaining round-4 stages with two fixes the
outage surfaced:

* every stage runs in a FRESH subprocess — the single-process chain
  grew to 68.5 GB over three stages (its predecessor OOM-killed at
  130 GB, dmesg 75515s) because jit caches and Orbax state accumulate
  across train() calls; a per-stage process resets that, and a stage
  crash (OOM, tunnel loss) no longer takes the whole chain down;
* the runner waits for the relay ports to accept before starting a
  stage, so a mid-outage launch blocks here instead of inside a jit.

Stages (tags match what scripts/round4_finish.py swaps):

  0 nsr-folda-cont     resume s2 from the interrupted run's epoch-27
                       checkpoint, then s3 / recal / final
  1 hillr-b0-folda     HILLR fine-tune of the fold-A nsr final
  2 unet-hillr-foldb   l1ws HILLR UNet, covers {8,10}
"""
import pathlib
import subprocess
import sys
import time
import traceback

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# nsr-folda-s2, interrupted at epoch 27/50 by the relay outage; both
# model/best and model/latest were written 19:53 (select_metric="last",
# so best tracks the end of schedule — resume pulls exactly epoch 27).
# The container reset after the outage wiped the gitignored models_r3/
# staging, so this partial run only exists if the same host survived;
# stage 0 probes for it and otherwise restarts the curriculum at s1
# (resuming from the *committed* fold-A nsr final is not an option: its
# checkpoint was selected by val p_e on cover 8, a fold-A eval cover,
# and the leak would propagate through the resume).
NSR_FOLDA_S2_PART = ("260817193119-tpu-b0-nostride-alpha_mix0.1-0.05-0.01"
                     "_grayscale_crossentropy_lr_0.0001_dr_0.2")


def _done_marker(tag: str):
    """Experiment name recorded by an earlier STAGE-DONE line in this
    chain's log, or None.  Lets a supervisor relaunch after a mid-stage
    death skip hours of finished sub-stages instead of re-training
    them (the stage functions key their hand-offs on these names).

    A marker whose staged run no longer exists under models_r3/ is
    ignored: the staging tree is gitignored, so a container reset can
    wipe the checkpoints while the log (or a stale copy of it) keeps
    the line — resuming from such a marker would hand a missing
    checkpoint to the next sub-stage and crash it."""
    log = REPO / "logs/round4_chain2.log"
    if not log.exists():
        return None
    for line in reversed(log.read_text().splitlines()):
        if line.startswith(f"STAGE-DONE {tag}: "):
            name = line.split(": ", 1)[1].strip()
            if any((REPO / "models_r3").glob(f"*/*/{name}")):
                return name
            print(f"marker {tag}: {name} has no staged run; ignoring",
                  flush=True)
            return None
    return None


def stage_nsr_folda_cont():
    from scripts.round2_train_b0 import COMMON, NSR
    from scripts.round3_chain import (FOLD_A, FULLRES, _recalibrate,
                                      _train_b0)
    tag = "nsr-folda"
    base = {**COMMON, **NSR, **FOLD_A, "select_metric": "last",
            "stego_method": "LSBR"}
    from scripts.round3_chain import B0_OUT
    part = B0_OUT / "LSBR" / NSR_FOLDA_S2_PART
    s2 = _done_marker(f"{tag}-s2")
    if not s2 and (part / "model/latest").exists():
        # same host survived the outage: finish the interrupted s2
        s2 = _train_b0({**base, "alpha": [0.1, 0.05, 0.01],
                        "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 25,
                        "learning_rate": 1e-4,
                        "resume": NSR_FOLDA_S2_PART})
    if not s2:
        # staging lost with the container: full curriculum restart
        s1 = _done_marker(f"{tag}-s1") or _train_b0(
            {**base, "alpha": [0.4, 0.2, 0.1], "val_alpha": [0.1],
             "num_epochs": 40})
        print(f"STAGE-DONE {tag}-s1: {s1}", flush=True)
        s2 = _train_b0({**base, "alpha": [0.1, 0.05, 0.01],
                        "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 50,
                        "learning_rate": 1e-4, "resume": s1})
    print(f"STAGE-DONE {tag}-s2: {s2}", flush=True)
    s3 = _done_marker(f"{tag}-s3") or _train_b0(
        {**base, **FULLRES, "alpha": [0.1, 0.05, 0.01],
         "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 15,
         "learning_rate": 3e-5, "resume": s2})
    print(f"STAGE-DONE {tag}-s3: {s3}", flush=True)
    recal = _done_marker(f"{tag}-recal") or _recalibrate("LSBR", s3)
    print(f"STAGE-DONE {tag}-recal: {recal}", flush=True)
    final = _train_b0({**base, **FULLRES, "freeze_bn": True,
                       "alpha": [0.1, 0.05, 0.01],
                       "val_alpha": [0.1, 0.05, 0.01], "num_epochs": 10,
                       "learning_rate": 2e-5, "resume": recal})
    print(f"STAGE-DONE {tag}-final: {final}", flush=True)


def stage_hillr_b0_folda():
    from scripts.round3_chain import FOLD_A, hillr_finetune
    hillr_finetune(FOLD_A, "hillr-b0-folda", done=_done_marker)


def stage_unet_hillr_foldb():
    from scripts.round3_chain import FOLD_B, L1WS, _train_unet
    cfg = {**L1WS, **FOLD_B, "stego_method": "HILLR",
           "num_epochs": 80, "patience": 80}
    exp = _train_unet(cfg)
    print(f"STAGE-DONE unet-hillr-foldb: {exp}", flush=True)


STAGES = [stage_nsr_folda_cont, stage_hillr_b0_folda,
          stage_unet_hillr_foldb]

def wait_for_relay(timeout_s: float = 36000.0) -> bool:
    # 10h: the round-4 relay outage (19:53) had no ETA; the chain is
    # the round's critical path, so it outwaits anything short of the
    # round itself ending.  scripts/round4_supervise.py relaunches the
    # chain if the relay only returns after this gate expires.
    from wsunet_tpu.bench import _tpu_reachable  # canonical probe
    t0 = time.time()
    notified = False
    while time.time() - t0 < timeout_s:
        if _tpu_reachable():
            return True
        if not notified:
            print("relay down; waiting for the axon tunnel...", flush=True)
            notified = True
        time.sleep(15)
    return False


def main(start: int = 0) -> int:
    for i, stage in enumerate(STAGES[start:], start):
        name = stage.__name__
        if not wait_for_relay():
            print(f"CHAIN-ABORT {name}: relay never came back", flush=True)
            return 1
        print(f"STAGE-START {i} {name}", flush=True)
        rc = subprocess.call(
            [sys.executable, __file__, "--stage", str(i)], cwd=REPO)
        if rc:
            print(f"STAGE-FAIL {i} {name}: rc={rc}", flush=True)
            # continue: later stages depend on nsr-folda only via
            # hillr-b0-folda; unet-hillr-foldb is independent
    print("CHAIN-END", flush=True)
    return 0


if __name__ == "__main__":
    if "--stage" in sys.argv:
        idx = int(sys.argv[sys.argv.index("--stage") + 1])
        try:
            STAGES[idx]()
        except Exception:
            traceback.print_exc()
            raise SystemExit(1)
        raise SystemExit(0)
    start = int(sys.argv[sys.argv.index("--start") + 1]) \
        if "--start" in sys.argv else 0
    raise SystemExit(main(start))
