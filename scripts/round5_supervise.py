"""Round-5 lifecycle supervisor: keep scripts/round5_chain.py alive
across relay outages, make finished stages durable immediately, then run
the end-game exactly once (cf. scripts/round4_supervise.py, plus the
ADVICE r4 fix: a failed incremental commit is distinguished from a
benign empty one via ``git diff --cached --quiet``).

Run: ``nohup python scripts/round5_supervise.py >
logs/round5_supervise.out 2>&1 & echo $! > /tmp/round5_supervise.pid``
(exactly one supervisor at a time — it is the only process allowed to
run the end-game / commit).
"""
import os
import pathlib
import signal
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.round5_chain import TERMINAL                 # noqa: E402

LOG = REPO / "logs/round5_chain.log"
NOTES = REPO / "logs/round5_supervise.log"
CHAIN_PID = pathlib.Path("/tmp/round5_chain.pid")
# Absolute cutoff: the TPU is exclusive to one process, so a chain still
# training when the round-end bench runs would block BENCH_r05 behind
# hours of training.  Round started 2026-08-18 ~23:40 UTC -> round end
# ~11:40 UTC; kill at 09:45 UTC (epoch below), leaving ~2 h for the
# end-game regen (~40 min in round 4) + bench.  Every sub-stage
# checkpoints continuously and resumes from log markers, so a kill
# loses nothing but the tail stage.
CHAIN_CUTOFF_EPOCH = 1_787_141_880  # 12:18 UTC (was 12:40): five of six
# stages finished by 12:12; the last (HILLR fold B, 60+15 epochs) cannot
# complete before any viable cutoff, so its partial training is pure
# discard — cutting now starts the end-game ~25 min earlier, which is
# exactly the margin the holdout regen's worst case (TPU step timeout ->
# CPU retry) needs before the ~15:00 round end.

STAGE_DONE = [f"STAGE-DONE {t}:" for t in TERMINAL]


def note(msg: str) -> None:
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    NOTES.parent.mkdir(exist_ok=True)
    with open(NOTES, "a") as f:
        f.write(line + "\n")


def chain_alive() -> bool:
    try:
        pid = int(CHAIN_PID.read_text().strip())
        cmdline = pathlib.Path(f"/proc/{pid}/cmdline").read_bytes()
    except (OSError, ValueError):
        return False
    return b"round5_chain" in cmdline


def relay_up() -> bool:
    from wsunet_tpu.bench import _tpu_reachable
    return _tpu_reachable()


# The chain logs an epoch line at least every ~100 s while healthy; the
# longest legitimately quiet phases (first B0/UNet compile, BN
# recalibration, checkpoint writes) are < 5 min.  A wedged axon
# connection (2026-08-19: twice) blocks forever without dying, which
# chain_alive() cannot see — so treat a long-silent log as a hang.
CHAIN_QUIET_LIMIT_S = 600


def chain_stalled() -> bool:
    try:
        age = time.time() - LOG.stat().st_mtime
    except OSError:
        return False
    return age > CHAIN_QUIET_LIMIT_S


def kill_chain_tree() -> None:
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
    LOG.parent.mkdir(exist_ok=True)
    with open(LOG, "a") as f:
        f.write(f"--- supervisor relaunch --start {start} ---\n")
        proc = subprocess.Popen(
            [sys.executable, "scripts/round5_chain.py", "--start",
             str(start)], cwd=REPO, stdout=f, stderr=subprocess.STDOUT)
    CHAIN_PID.write_text(str(proc.pid))
    note(f"relaunched chain --start {start} (pid {proc.pid})")


def incremental_swap(new_markers) -> bool:
    """Make freshly finished stages durable now: models_r3 staging is
    gitignored and container resets wipe it (round-4 lost checkpoints
    and chain logs that way)."""
    rc = subprocess.call(
        [sys.executable, "scripts/round5_finish.py", "--swap-only"],
        cwd=REPO)
    note(f"incremental swap rc={rc} for {sorted(new_markers)}")
    if rc:
        return False
    subprocess.call(["git", "add", "models", "models_foldb",
                     "models_ablation"], cwd=REPO)
    # ADVICE r4: only skip the commit when the index is genuinely clean;
    # any other nonzero commit rc is a real failure -> retry next loop
    clean = subprocess.call(["git", "diff", "--cached", "--quiet"],
                            cwd=REPO) == 0
    if clean:
        note("incremental commit skipped (zoo already current)")
        return True
    tags = ", ".join(m.split()[-1].rstrip(":") for m in sorted(new_markers))
    crc = subprocess.call(
        ["git", "commit", "-m",
         f"Swap finished round-5 stage(s) into the committed zoos: {tags}"],
        cwd=REPO)
    note(f"incremental commit rc={crc}")
    return crc == 0


def endgame() -> int:
    rc = subprocess.call([sys.executable, "scripts/round5_finish.py"],
                         cwd=REPO)
    note(f"round5_finish rc={rc}")
    if rc == 0:
        subprocess.call(["git", "add", "-A"], cwd=REPO)
        if subprocess.call(["git", "diff", "--cached", "--quiet"],
                           cwd=REPO) != 0:
            crc = subprocess.call(
                ["git", "commit", "-m",
                 "Round-5 chain results: holdout tables, ablation n-axis, "
                 "anchor-recipe UNet rows"], cwd=REPO)
            note(f"commit rc={crc}")
    bench_out = REPO / "BENCH_r5_postchain.json"
    with open(bench_out, "w") as f:
        brc = subprocess.call([sys.executable, "bench.py"], cwd=REPO,
                              stdout=f)
    note(f"bench rc={brc} -> {bench_out.name}")
    if brc == 0:
        subprocess.call(["git", "add", str(bench_out)], cwd=REPO)
        if subprocess.call(["git", "diff", "--cached", "--quiet"],
                           cwd=REPO) != 0:
            subprocess.call(["git", "commit", "-m",
                             "Post-chain TPU bench snapshot"], cwd=REPO)
    return rc


def main() -> int:
    t0 = time.time()
    relaunches = 0
    swapped = set()
    note("supervising the round-5 chain...")
    while True:
        text = LOG.read_text() if LOG.exists() else ""
        new_markers = {m for m in STAGE_DONE if m in text} - swapped
        if new_markers and "CHAIN-END" not in text and chain_alive():
            if incremental_swap(new_markers):
                swapped |= new_markers
        if time.time() > CHAIN_CUTOFF_EPOCH and chain_alive():
            note("round-end cutoff: killing the chain tree (stages "
                 "resume from markers later)")
            kill_chain_tree()
            time.sleep(10)
            text = LOG.read_text() if LOG.exists() else ""
            if any(m in text for m in STAGE_DONE):
                note("cutoff end-game on what finished")
                return endgame()
            note("cutoff; nothing finished — no end-game")
            return 0
        if "CHAIN-END" in text or resume_index(text) >= len(STAGE_DONE):
            note("chain complete; running the end-game")
            return endgame()
        if chain_alive():
            if chain_stalled():
                note(f"chain log silent > {CHAIN_QUIET_LIMIT_S}s with the "
                     "process alive — wedged axon connection; killing the "
                     "chain tree (stages resume from markers)")
                kill_chain_tree()
                # fall through: next iteration sees the chain dead and
                # relaunches once the relay passes the compute probe
            time.sleep(60)
            continue
        if time.time() > CHAIN_CUTOFF_EPOCH:
            if any(m in text for m in STAGE_DONE):
                note("cutoff end-game on what finished")
                return endgame()
            note("cutoff; nothing finished — no end-game")
            return 0
        if time.time() - t0 > 11.5 * 3600:
            note("deadline; end-game on what finished"
                 if any(m in text for m in STAGE_DONE)
                 else "deadline; nothing finished — no end-game")
            return endgame() if any(m in text for m in STAGE_DONE) else 0
        if relay_up():
            if relaunches >= 20:
                note("relaunch cap hit; end-game on what finished")
                return endgame()
            relaunches += 1
            relaunch(resume_index(text))
            time.sleep(60)
        else:
            time.sleep(30)


if __name__ == "__main__":
    raise SystemExit(main())
