"""Round-4 end-game watcher: when the training chain finishes, run the
finisher (fold-zoo swaps + full results regeneration including the
leak-free holdout tables), publish the holdout table into README/PARITY,
and commit the artifacts.

Insurance against session interruption: the round-3 deliverable was lost
because the finisher needed a human to launch it after the chain — this
process sits on logs/round4_chain2.log and does it unattended.

  CHAIN-END   -> finish + publish + commit
  CHAIN-ABORT -> (relay never returned) commit nothing, leave a marker

Run: python scripts/round4_watch.py [--no-commit]
"""
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
LOG = REPO / "logs/round4_chain2.log"
MARKER = REPO / "logs/round4_watch.log"


def note(msg: str) -> None:
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    with open(MARKER, "a") as f:
        f.write(line + "\n")


def wait_for_chain(poll_s: float = 60.0) -> str:
    while True:
        text = LOG.read_text() if LOG.exists() else ""
        if "CHAIN-END" in text:
            return "end"
        if "CHAIN-ABORT" in text:
            return "abort"
        time.sleep(poll_s)


def main(commit: bool = True) -> int:
    note("watching for chain completion...")
    state = wait_for_chain()
    note(f"chain state: {state}")
    if state == "abort":
        note("relay never returned; finisher not run (needs TPU)")
        return 1
    rc = subprocess.call([sys.executable, "scripts/round4_finish.py"],
                         cwd=REPO)
    note(f"round4_finish rc={rc}")
    if rc:
        return rc
    rc = subprocess.call([sys.executable, "scripts/round4_publish.py"],
                         cwd=REPO)
    note(f"round4_publish rc={rc}")
    if commit and rc == 0:
        subprocess.call(["git", "add", "-A"], cwd=REPO)
        rc = subprocess.call(
            ["git", "commit", "-m",
             "Leak-free holdout detection tables; README/PARITY headline "
             "the holdout-vs-golden comparison"], cwd=REPO)
        note(f"commit rc={rc}")
    # TPU bench snapshot while the chip is free (the driver's own bench
    # run happens at round end; this one records the post-chain state
    # with the fast decode path + serving latency for BENCH_r04 triage)
    bench_out = REPO / "logs/bench_r4_postchain.json"
    with open(bench_out, "w") as f:
        brc = subprocess.call([sys.executable, "bench.py"], cwd=REPO,
                              stdout=f)
    note(f"bench rc={brc} -> {bench_out.name}")
    if commit and brc == 0:
        subprocess.call(["git", "add", str(bench_out)], cwd=REPO)
        subprocess.call(["git", "commit", "-m",
                         "Post-chain TPU bench snapshot"], cwd=REPO)
    return rc


if __name__ == "__main__":
    raise SystemExit(main(commit="--no-commit" not in sys.argv))
