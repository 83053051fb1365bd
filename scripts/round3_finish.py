"""Post-chain round-3 finisher: swap the chain winners into the fold
zoos, then regenerate the full results tree (pooled tables + leak-free
holdout tables, scripts/make_results.py).

Reads the STAGE-DONE markers printed by scripts/round3_chain.py from the
chain log (default logs/round3_stages1-4.log) and performs the
pre-committed swaps:

  unet-lsbr-foldb-dr      -> fold B unet LSBR   (the dropout variant —
                             decision pre-committed on round-2 evidence
                             BEFORE its holdout scores existed)
  nsr-foldb-final         -> fold B b0 LSBR
  plain-folda-final       -> fold A b0 LSBR  (supersedes the leaky plain)
  hillr-b0-foldb-final    -> fold B b0 HILLR

Stages that did not finish are skipped with a notice (the holdout pool
simply lacks those rows).  Checkpoint slimming (export_demo_models) pins
the process to CPU, so the swap+slim phase runs in a subprocess and the
TPU-bound results regeneration in the parent.  Run with the host
otherwise idle.
"""
import pathlib
import re
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SWAPS = [
    ("unet-lsbr-foldb-dr", "b", "unet", "LSBR"),
    ("nsr-foldb-final", "b", "b0", "LSBR"),
    ("plain-folda-final", "a", "b0", "LSBR"),
    ("hillr-b0-foldb-final", "b", "b0", "HILLR"),
]


def stage_done(log_text: str) -> dict:
    """tag -> run name (basename for the unet stages, which print paths)."""
    out = {}
    for m in re.finditer(r"^STAGE-DONE (\S+): (\S+)$", log_text, re.M):
        out[m.group(1)] = pathlib.PurePath(m.group(2)).name
    return out


def do_swaps(log_path):
    from scripts.export_demo_models import export
    from scripts.round3_swap import DST, swap
    done = stage_done(pathlib.Path(log_path).read_text())
    for tag, name in sorted(done.items()):
        print(f"chain: {tag}: {name}")
    touched = set()
    for tag, fold, family, method in SWAPS:
        if tag not in done:
            print(f"SKIP {tag}: stage not finished")
            continue
        swap(fold, family, method, done[tag])
        touched.add((fold, family))
    for fold, family in sorted(touched):
        export(REPO / DST[fold] / family)


def main(log_path=REPO / "logs/round3_stages1-4.log", results=True):
    rc = subprocess.call(
        [sys.executable, __file__, str(log_path), "--swap-only"],
        cwd=REPO)
    if rc or not results:
        return rc
    from scripts.make_results import main as make_results
    return make_results()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    log = args[0] if args else REPO / "logs/round3_stages1-4.log"
    if "--swap-only" in sys.argv:
        do_swaps(log)
        raise SystemExit(0)
    raise SystemExit(main(log, results="--no-results" not in sys.argv))
