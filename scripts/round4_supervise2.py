"""Second-shift supervisor: run the plain-B0 data-bound ablation
(scripts/round4_ablation.py) in the TPU window AFTER the round-4 chain
lifecycle ends, without ever contending for the chip.

Waits until BOTH the chain (/tmp/round4_chain2.pid) and the primary
supervisor (/tmp/round4_supervise.pid, which owns the chain end-game +
bench) have exited — only then is the TPU free.  Safety net: if the
primary supervisor died without running its end-game (CHAIN-END present
but no ``round4_finish rc`` note), run that end-game first, because the
published holdout tables outrank the ablation.

Then owns the ablation exactly like round4_supervise owns the chain:
relaunch on death from the ABL-DONE markers, and at the deadlines
degrade gracefully — no NEW training starts after TRAIN_START_DEADLINE,
and at CUTOFF the ablation tree is killed and ``--salvage`` publishes
whatever finished (the n=2/3 rows come from committed artifacts, so the
ablation note ships even if the n=4 run never trains).

Run: ``nohup python scripts/round4_supervise2.py >
logs/round4_supervise2.stdout 2>&1 & echo $! >
/tmp/round4_supervise2.pid``
"""
import os
import pathlib
import signal
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.round4_supervise import (CHAIN_PID, LOG as CHAIN_LOG,  # noqa: E402
                                      endgame, relay_up)

ABL_LOG = REPO / "logs/round4_ablation.log"
NOTES = REPO / "logs/round4_supervise2.log"
SUP1_PID = pathlib.Path("/tmp/round4_supervise.pid")
ABL_PID = pathlib.Path("/tmp/round4_ablation.pid")

# No new curriculum start after this (a full curriculum needs ~2.5h);
# salvage instead.  Hard cutoff: kill training, publish what exists.
TRAIN_START_DEADLINE = 1_787_082_300   # 19:45 UTC
CUTOFF = 1_787_089_500                 # 21:45 UTC (round end ~23:45)


def note(msg: str) -> None:
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    with open(NOTES, "a") as f:
        f.write(line + "\n")


def pid_alive(pid_file: pathlib.Path, needle: bytes) -> bool:
    try:
        pid = int(pid_file.read_text().strip())
        cmdline = pathlib.Path(f"/proc/{pid}/cmdline").read_bytes()
    except (OSError, ValueError):
        return False
    return needle in cmdline


def tpu_busy() -> bool:
    return (pid_alive(CHAIN_PID, b"round4_chain2")
            or pid_alive(SUP1_PID, b"round4_supervise"))


def kill_abl_tree() -> None:
    try:
        pid = int(ABL_PID.read_text().strip())
    except (OSError, ValueError):
        return
    victims = []
    for p in pathlib.Path("/proc").iterdir():
        if not p.name.isdigit():
            continue
        try:
            stat = (p / "stat").read_text()
            ppid = int(stat.rsplit(")", 1)[1].split()[1])
        except (OSError, IndexError, ValueError):
            continue
        if ppid == pid:
            victims.append(int(p.name))
    for victim in victims + [pid]:
        try:
            os.kill(victim, signal.SIGTERM)
            note(f"killed {victim}")
        except OSError:
            pass


def launch(salvage: bool) -> None:
    args = [sys.executable, "scripts/round4_ablation.py"]
    if salvage:
        args.append("--salvage")
    with open(ABL_LOG, "a") as f:
        f.write(f"--- supervise2 launch salvage={salvage} ---\n")
        proc = subprocess.Popen(args, cwd=REPO, stdout=f,
                                stderr=subprocess.STDOUT)
    ABL_PID.write_text(str(proc.pid))
    note(f"launched ablation salvage={salvage} (pid {proc.pid})")


def salvage_and_exit() -> int:
    kill_abl_tree()
    time.sleep(10)
    launch(salvage=True)
    while pid_alive(ABL_PID, b"round4_ablation"):
        time.sleep(20)
    done = "ABL-ALL-DONE" in (ABL_LOG.read_text()
                              if ABL_LOG.exists() else "")
    note(f"salvage finished (ABL-ALL-DONE={done})")
    return 0 if done else 1


def main() -> int:
    note("waiting for the chain lifecycle to release the TPU...")
    launches = 0
    while True:
        if tpu_busy():
            if time.time() > CUTOFF + 3600:
                note("chain lifecycle still running past every deadline; "
                     "standing down (no salvage would get the chip)")
                return 1
            time.sleep(60)
            continue
        # TPU free.  Safety net: primary supervisor dead without its
        # end-game -> the holdout tables outrank the ablation
        chain_text = CHAIN_LOG.read_text() if CHAIN_LOG.exists() else ""
        sup1_notes = (REPO / "logs/round4_supervise.log")
        sup1_text = (sup1_notes.read_text() if sup1_notes.exists() else "")
        if ("CHAIN-END" in chain_text
                and "round4_finish rc" not in sup1_text):
            note("primary supervisor died before its end-game; "
                 "running it now")
            endgame()
            continue  # re-check state (endgame notes land in sup1 log)
        abl_text = ABL_LOG.read_text() if ABL_LOG.exists() else ""
        if "ABL-ALL-DONE" in abl_text:
            note("ablation complete")
            return 0
        if pid_alive(ABL_PID, b"round4_ablation"):
            if time.time() > CUTOFF:
                note("cutoff: killing the ablation; salvaging")
                return salvage_and_exit()
            time.sleep(60)
            continue
        if time.time() > CUTOFF:
            note("cutoff with ablation dead; salvaging")
            return salvage_and_exit()
        if ("ABL-DONE final" not in abl_text
                and time.time() > TRAIN_START_DEADLINE):
            note("too late to (re)start the curriculum; salvaging")
            return salvage_and_exit()
        if launches >= 10:
            note("launch cap hit; salvaging")
            return salvage_and_exit()
        if relay_up():
            launches += 1
            launch(salvage=False)
            time.sleep(60)
        else:
            time.sleep(30)


if __name__ == "__main__":
    raise SystemExit(main())
