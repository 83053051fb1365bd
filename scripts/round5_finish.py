"""Round-5 finisher: swap chain winners into the committed zoos, then
regenerate the leak-free holdout tables and the extended data-bound
ablation table.

Swaps (scripts/round5_chain.py TERMINAL markers -> destinations):

  unet-lsbr-folda-w   -> models/unet/LSBR        (anchor recipe, item 4)
  unet-lsbr-foldb-w   -> models_foldb/unet/LSBR
  unet-hillr-folda-w  -> models/unet/HILLR       (item 5)
  unet-hillr-foldb-w  -> models_foldb/unet/HILLR
  abl-p16             -> models_ablation/b0_p256/LSBR   (item 3)
  abl-p64             -> models_ablation/b0_p128/LSBR

Stages that did not finish are skipped with a notice.  ``--swap-only``
performs just the durability swaps (used incrementally by
scripts/round5_supervise.py); the full run then regenerates
results/detection/*_holdout.csv (scripts/round3_holdout.py — the new
UNet runs supersede the old rows automatically via the newest-clean-run
rule), re-splices the README/PARITY holdout tables
(scripts/round4_publish.py), and rebuilds the extended ablation table +
doc (scripts/round5_ablation.py).
"""
import json
import pathlib
import shutil
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.round5_chain import LOG, _find_run           # noqa: E402

# tag -> (kind, destination family dir under the zoo)
UNET_SWAPS = [
    ("unet-lsbr-folda-w", "a", "LSBR"),
    ("unet-lsbr-foldb-w", "b", "LSBR"),
    ("unet-hillr-folda-w", "a", "HILLR"),
    ("unet-hillr-foldb-w", "b", "HILLR"),
]
ABL_SWAPS = [
    ("abl-p16", "b0_p256"),
    ("abl-p64", "b0_p128"),
]


def _terminal_done(tag: str):
    """Newest terminal marker for ``tag`` with a surviving run dir
    (staging or committed zoo — idempotent across reruns)."""
    if not LOG.exists():
        return None
    for line in reversed(LOG.read_text().splitlines()):
        if line.startswith(f"STAGE-DONE {tag}: "):
            run = line.split(": ", 1)[1].strip()
            if _find_run(run) is not None:
                return run
    return None


def _swap_abl(tag: str, family: str, run: str) -> None:
    """Copy an ablation run into models_ablation/<family>/LSBR (replacing
    any previous run there: each patch size holds exactly one model)."""
    src = _find_run(run)
    dst_root = REPO / "models_ablation" / family / "LSBR"
    dst = dst_root / run
    if dst == src:
        return
    dst_root.mkdir(parents=True, exist_ok=True)
    for old in dst_root.iterdir():
        if old.is_dir():
            shutil.rmtree(old)
    print(f"copy {src} -> {dst}")
    shutil.copytree(src, dst)


def do_swaps() -> None:
    from scripts.export_demo_models import export
    from scripts.round3_swap import DST, swap

    touched = set()
    for tag, fold, method in UNET_SWAPS:
        run = _terminal_done(tag)
        if run is None:
            print(f"SKIP {tag}: stage not finished")
            continue
        if (REPO / DST[fold] / "unet" / method / run).exists():
            continue  # already swapped (idempotent incremental calls)
        swap(fold, "unet", method, run)
        touched.add(fold)
    for fold in sorted(touched):
        export(REPO / DST[fold] / "unet")
    for tag, family in ABL_SWAPS:
        run = _terminal_done(tag)
        if run is None:
            print(f"SKIP {tag}: stage not finished")
            continue
        if (REPO / "models_ablation" / family / "LSBR" / run).exists():
            continue
        _swap_abl(tag, family, run)
        export(REPO / "models_ablation" / family)
    # refresh attestations so the holdout admission guard's evidence
    # covers the new runs (they also declare select_metric="last")
    from scripts.attest_checkpoints import main as attest_main
    attest_main(["models/unet/*/*/config.json",
                 "models_foldb/unet/*/*/config.json"])


def _step(script: str, cpu: bool, timeout_s: int,
          cpu_retry_timeout_s: int = None) -> int:
    """Run one regen script as a bounded subprocess.  The axon relay can
    wedge MID-RUN (port open, compute dead — 2026-08-19, twice), which
    an in-process call would turn into an endgame that never finishes;
    on timeout or failure the step retries once pinned to CPU."""
    args = [sys.executable, script] + (["--cpu"] if cpu else [])
    try:
        rc = subprocess.call(args, cwd=REPO, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f"finish: {script} timed out after {timeout_s}s", flush=True)
        rc = -9
    if rc and not cpu and cpu_retry_timeout_s:
        print(f"finish: {script} rc={rc}; retrying on CPU", flush=True)
        try:
            rc = subprocess.call([sys.executable, script, "--cpu"],
                                 cwd=REPO, timeout=cpu_retry_timeout_s)
        except subprocess.TimeoutExpired:
            print(f"finish: {script} CPU retry timed out", flush=True)
            rc = -9
    return rc


def main(results: bool = True) -> int:
    rc = subprocess.call([sys.executable, __file__, "--swap-only"],
                         cwd=REPO)
    if rc or not results:
        return rc
    # regen is TPU-bound when the relay is up; pin to CPU when it is not
    # so the unattended end-game always terminates (cf. round4_finish).
    # _tpu_reachable probes an actual computation, so a wedged-at-start
    # relay lands on CPU immediately; mid-run wedges hit the per-step
    # timeouts and CPU retries in _step.
    from wsunet_tpu.bench import _tpu_reachable
    cpu = not _tpu_reachable()
    if cpu:
        print("finish: relay down; regenerating on CPU", flush=True)
    hrc = _step("scripts/round3_holdout.py", cpu, 2700, 5400)
    prc = subprocess.call([sys.executable, "scripts/round4_publish.py"],
                          cwd=REPO)  # CSV splicing only; no device work
    arc = _step("scripts/round5_ablation.py", cpu, 2700, 5400)
    urc = _step("scripts/round5_unet_sweep.py", cpu, 2700, 5400)
    print(f"finish: holdout rc={hrc} publish rc={prc} ablation rc={arc} "
          f"unet-sweep rc={urc}", flush=True)
    return hrc or prc or arc or urc


if __name__ == "__main__":
    if "--swap-only" in sys.argv:
        do_swaps()
        raise SystemExit(0)
    raise SystemExit(main())
