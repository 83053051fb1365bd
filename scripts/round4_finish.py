"""Round-4 finisher: swap ALL chain winners (rounds 3+4) into the fold
zoos, then regenerate the results tree including the leak-free holdout
tables (VERDICT r3 next-round item 1).

Reads STAGE-DONE markers from both chain logs
(logs/round3_stages1-4.log, logs/round4_chain.log) and performs the
pre-committed swaps — fold A models into models/ (primary registry),
fold B into models_foldb/ (consumed by scripts/round3_holdout.py):

  unet-lsbr-foldb-dr      -> fold B unet LSBR (dropout variant — decision
                             pre-committed on round-2 evidence BEFORE its
                             holdout scores existed)
  unet-hillr-foldb        -> fold B unet HILLR
  nsr-foldb-final         -> fold B b0 LSBR
  nsr-folda-final         -> fold A b0 LSBR (replaces the excluded leaky
                             round-2 run)
  plain-folda-final       -> fold A b0 LSBR (coexists with nsr: b0
                             signature = (no_stem_stride, lsbr_reference))
  plain-foldb-final       -> fold B b0 LSBR
  hillr-b0-folda-final    -> fold A b0 HILLR
  hillr-b0-foldb-final    -> fold B b0 HILLR

Stages that did not finish are skipped with a notice.  Checkpoint
slimming pins the process to CPU, so the swap+slim phase runs in a
subprocess and the TPU-bound results regeneration in the parent.  Run
with the host otherwise idle.
"""
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.round3_finish import stage_done              # noqa: E402

LOGS = [REPO / "logs/round3_stages1-4.log", REPO / "logs/round4_chain.log",
        REPO / "logs/round4_chain2.log"]

SWAPS = [
    ("unet-lsbr-foldb-dr", "b", "unet", "LSBR"),
    ("unet-hillr-foldb", "b", "unet", "HILLR"),
    ("nsr-foldb-final", "b", "b0", "LSBR"),
    ("nsr-folda-final", "a", "b0", "LSBR"),
    ("plain-folda-final", "a", "b0", "LSBR"),
    ("plain-foldb-final", "b", "b0", "LSBR"),
    ("hillr-b0-folda-final", "a", "b0", "HILLR"),
    ("hillr-b0-foldb-final", "b", "b0", "HILLR"),
]


def do_swaps():
    from scripts.export_demo_models import export
    from scripts.round3_swap import DST, swap
    done = {}
    for log in LOGS:
        if log.exists():
            done.update(stage_done(log.read_text()))
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
    # newly swapped fold-B runs declare select_metric="last" so they pass
    # the holdout guard without attestation; (re-)attest anything that
    # does not, so the guard's evidence stays fresh post-swap
    from scripts.attest_checkpoints import main as attest_main
    attest_main(["models/unet/*/*/config.json",
                 "models_foldb/unet/*/*/config.json"])


def main(results=True):
    rc = subprocess.call([sys.executable, __file__, "--swap-only"],
                         cwd=REPO)
    if rc or not results:
        return rc
    # The regen is TPU-bound when the axon relay is up, but the relay can
    # die between a stage finishing and the end-game running — and with
    # libtpu installed the first jax call then blocks forever instead of
    # failing.  Probe first and pin to CPU (validated bit-identical to
    # the TPU artifacts, logs/make_results_check.log) so the supervisor's
    # unattended end-game always terminates.
    from wsunet_tpu.bench import _tpu_reachable
    if not _tpu_reachable():
        import jax
        print("round4_finish: relay down; regenerating results on CPU")
        jax.config.update("jax_platforms", "cpu")
    from scripts.make_results import main as make_results
    return make_results()


if __name__ == "__main__":
    if "--swap-only" in sys.argv:
        do_swaps()
        raise SystemExit(0)
    raise SystemExit(main(results="--no-results" not in sys.argv))
