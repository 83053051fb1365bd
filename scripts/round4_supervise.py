"""Round-4 lifecycle supervisor: keep the training chain alive across
relay outages, then run the end-game exactly once.

Supersedes scripts/round4_watch.py (which only *watched*: it exited on
CHAIN-ABORT, so a relay that came back after the chain's 10 h gate
expired would leave the round stalled with a healthy TPU).  This
process owns the whole lifecycle instead:

* chain process dead without CHAIN-END (gate expiry, OOM, crash) ->
  wait for the relay, then relaunch ``scripts/round4_chain2.py`` with
  ``--start <first unfinished stage>`` (stage completion is judged by
  the stages' own terminal STAGE-DONE markers, not by STAGE-START,
  so a mid-stage death resumes the right stage);
* CHAIN-END in the log -> finisher (fold-zoo swap + results regen incl.
  the leak-free holdout tables) -> publish (README/PARITY splice) ->
  commit -> post-chain TPU bench snapshot, then exit.

Decisions key off process liveness + markers only; stale CHAIN-ABORT
lines from earlier gate expiries are deliberately ignored.

Run: ``nohup python scripts/round4_supervise.py & echo $! >
/tmp/round4_supervise.pid`` (exactly one supervisor at a time — it is
the only process allowed to run the end-game / commit).
"""
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

LOG = REPO / "logs/round4_chain2.log"
NOTES = REPO / "logs/round4_supervise.log"
CHAIN_PID = pathlib.Path("/tmp/round4_chain2.pid")
DEADLINE_S = 11.5 * 3600  # stop relaunching when the round must wrap up
# Absolute cutoff (2026-08-18 16:15 UTC, ~round end minus margin): the
# TPU is exclusive to one process, so a chain still training when the
# driver's round-end bench runs would block the BENCH_r04 measurement
# behind hours of training.  Kill the chain tree instead — every
# sub-stage checkpoints continuously and resumes from log markers, so
# round 5 loses nothing — and salvage what finished.
# (Was 13:30, then 16:15, then 17:20: each session restart refreshes
# the ~12 h round budget.  The 2026-08-18 11:15 restart — container
# recreated, relay back up — puts round end at ~23:45, so 21:20 keeps
# ~2 h for the end-game regen + bench + the driver's round-end bench.)
CHAIN_CUTOFF_EPOCH = 1_787_088_000

# terminal marker of each chain2 stage (round4_chain2.STAGES order);
# a stage is complete iff its marker is in the log
STAGE_DONE = [
    "STAGE-DONE nsr-folda-final",
    "STAGE-DONE hillr-b0-folda-final",
    "STAGE-DONE unet-hillr-foldb",
]


def note(msg: str) -> None:
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    with open(NOTES, "a") as f:
        f.write(line + "\n")


def chain_alive() -> bool:
    try:
        pid = int(CHAIN_PID.read_text().strip())
        cmdline = pathlib.Path(f"/proc/{pid}/cmdline").read_bytes()
    except (OSError, ValueError):
        return False
    return b"round4_chain2" in cmdline


def relay_up() -> bool:
    # canonical probe (single source for the relay port / plugin logic)
    from wsunet_tpu.bench import _tpu_reachable
    return _tpu_reachable()


def kill_chain_tree() -> None:
    """SIGTERM the chain runner and its stage subprocess (the runner is
    not a session leader, so walk /proc for its children first)."""
    import signal
    try:
        pid = int(CHAIN_PID.read_text().strip())
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


def resume_index(text: str) -> int:
    for i, marker in enumerate(STAGE_DONE):
        if marker not in text:
            return i
    return len(STAGE_DONE)


def relaunch(start: int) -> None:
    with open(LOG, "a") as f:
        f.write(f"--- supervisor relaunch --start {start} ---\n")
        proc = subprocess.Popen(
            [sys.executable, "scripts/round4_chain2.py", "--start",
             str(start)], cwd=REPO, stdout=f, stderr=subprocess.STDOUT)
    CHAIN_PID.write_text(str(proc.pid))
    note(f"relaunched chain2 --start {start} (pid {proc.pid})")


def endgame() -> int:
    rc = subprocess.call([sys.executable, "scripts/round4_finish.py"],
                         cwd=REPO)
    note(f"round4_finish rc={rc}")
    if rc == 0:
        rc = subprocess.call([sys.executable, "scripts/round4_publish.py"],
                             cwd=REPO)
        note(f"round4_publish rc={rc}")
    if rc == 0:
        subprocess.call(["git", "add", "-A"], cwd=REPO)
        crc = subprocess.call(
            ["git", "commit", "-m",
             "Holdout detection tables from the completed round-4 fold "
             "zoo; README/PARITY quote holdout-vs-golden"], cwd=REPO)
        note(f"commit rc={crc}")
    # repo root, NOT logs/: logs/ is gitignored, so `git add` there is
    # refused and a container reset would wipe the snapshot
    bench_out = REPO / "BENCH_r4_postchain.json"
    with open(bench_out, "w") as f:
        brc = subprocess.call([sys.executable, "bench.py"], cwd=REPO,
                              stdout=f)
    note(f"bench rc={brc} -> {bench_out.name}")
    if brc == 0:
        subprocess.call(["git", "add", str(bench_out)], cwd=REPO)
        subprocess.call(["git", "commit", "-m",
                         "Post-chain TPU bench snapshot"], cwd=REPO)
    return rc


def incremental_swap(new_markers) -> bool:
    """Swap freshly finished stages into the committed fold zoos NOW
    instead of waiting for the end-game.  The staging tree
    (models_r3/) is gitignored and container resets wipe it — this
    round lost an epoch-27 checkpoint and every chain log that way —
    so each finished stage is made durable the moment it exists.  The
    end-game's full swap remains idempotent on top of these."""
    rc = subprocess.call(
        [sys.executable, "scripts/round4_finish.py", "--swap-only"],
        cwd=REPO)
    note(f"incremental swap rc={rc} for {sorted(new_markers)}")
    if rc:
        return False
    subprocess.call(["git", "add", "models", "models_foldb"], cwd=REPO)
    tags = ", ".join(m.split()[-1] for m in sorted(new_markers))
    crc = subprocess.call(
        ["git", "commit", "-m",
         f"Swap finished chain stage(s) into the fold zoos: {tags}"],
        cwd=REPO)
    # empty commit (zoo already current after a supervisor restart)
    # exits nonzero — the swap itself succeeded, don't retry forever
    note(f"incremental commit rc={crc}")
    return True


def main() -> int:
    t0 = time.time()
    relaunches = 0
    swapped = set()
    note("supervising the round-4 chain...")
    while True:
        text = LOG.read_text() if LOG.exists() else ""
        new_markers = {m for m in STAGE_DONE if m in text} - swapped
        if new_markers and "CHAIN-END" not in text and chain_alive():
            # chain already ended -> the end-game below does the full
            # swap anyway; only mid-chain completions need durability
            if incremental_swap(new_markers):
                swapped |= new_markers
        if time.time() > CHAIN_CUTOFF_EPOCH and chain_alive():
            note("round-end cutoff: killing the chain tree so the "
                 "driver's bench gets a free chip (stages resume from "
                 "markers next round)")
            kill_chain_tree()
            time.sleep(10)
            # re-read: a stage can print its terminal marker between the
            # snapshot above and the SIGTERM landing — deciding on the
            # stale text would discard a freshly finished fold model
            text = LOG.read_text() if LOG.exists() else ""
            if any(m in text for m in STAGE_DONE):
                note("cutoff end-game on what finished")
                return endgame()
            note("cutoff; nothing new finished — no end-game")
            return 0
        if "CHAIN-END" in text or resume_index(text) >= len(STAGE_DONE):
            note("chain complete; running the end-game")
            return endgame()
        if chain_alive():
            time.sleep(60)
            continue
        if time.time() - t0 > DEADLINE_S:
            if not any(m in text for m in STAGE_DONE):
                # nothing new finished: a regen would re-derive the
                # committed results and could hold the TPU exactly when
                # the driver's round-end bench needs it
                note("deadline; no new stage finished — no end-game")
                return 0
            note("deadline reached with the chain incomplete; end-game "
                 "on what finished")
            return endgame()
        if time.time() > CHAIN_CUTOFF_EPOCH:
            # chain already dead and past cutoff: no new training starts
            if any(m in text for m in STAGE_DONE):
                note("cutoff end-game on what finished")
                return endgame()
            note("cutoff; nothing new finished — no end-game")
            return 0
        if relay_up():
            if relaunches >= 20:  # crash-loop guard: salvage what ran
                note("relaunch cap hit; end-game on what finished")
                return endgame()
            relaunches += 1
            relaunch(resume_index(text))
            time.sleep(60)
        else:
            time.sleep(30)


if __name__ == "__main__":
    raise SystemExit(main())
