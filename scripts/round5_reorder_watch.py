"""One-shot mid-round helper (2026-08-19): the chain process that is
currently training fold A was launched from the PRE-reorder
round5_chain.py, so on finishing fold A it would proceed straight to the
untrimmed fold B.  This watcher waits for fold A's terminal marker and
then SIGTERMs the chain pid; the (restarted) supervisor relaunches it
within a minute with the reordered stage list, resuming at abl-p16.
Safe to leave running: it exits after one trigger, and if the chain pid
already belongs to a post-reorder launch the kill/relaunch cycle is a
<2-minute no-op (stage resume is marker-based).
"""
import os
import pathlib
import signal
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
LOG = REPO / "logs/round5_chain.log"
MARKER = "STAGE-DONE unet-lsbr-folda-w: "


def main() -> None:
    while True:
        text = LOG.read_text() if LOG.exists() else ""
        if MARKER in text:
            try:
                pid = int(pathlib.Path("/tmp/round5_chain.pid")
                          .read_text().strip())
                os.kill(pid, signal.SIGTERM)
                print(f"fold A done; killed chain pid {pid} for the "
                      "reordered relaunch", flush=True)
            except (OSError, ValueError) as e:
                print(f"trigger hit but kill failed: {e}", flush=True)
            return
        time.sleep(10)


if __name__ == "__main__":
    main()
