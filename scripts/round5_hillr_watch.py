"""One-shot mid-round helper #2 (2026-08-19, cf. round5_reorder_watch):
the running chain process predates the score-blind HILLR time-budget
trim (stage_unet_hillr_folda_w, 60+15 -> 40+10 epochs), so left alone it
would start the untrimmed fine-tune at the fold-B boundary and be killed
half-done by the 12:40 cutoff.  This watcher waits for fold B's terminal
marker and SIGTERMs the chain pid; the supervisor relaunches it within a
minute with the trimmed module at --start 4 (unet-hillr-folda-w).

Safe to leave running: exits after one trigger, and a kill at a stage
boundary costs nothing (marker-based resume).
"""
import os
import pathlib
import signal
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
LOG = REPO / "logs/round5_chain.log"
MARKER = "STAGE-DONE unet-lsbr-foldb-w: "


def main() -> None:
    while True:
        text = LOG.read_text() if LOG.exists() else ""
        if MARKER in text:
            try:
                pid = int(pathlib.Path("/tmp/round5_chain.pid")
                          .read_text().strip())
                os.kill(pid, signal.SIGTERM)
                print(f"fold B done; killed chain pid {pid} for the "
                      "trimmed-HILLR relaunch", flush=True)
            except (OSError, ValueError) as e:
                print(f"trigger hit but kill failed: {e}", flush=True)
            return
        time.sleep(10)


if __name__ == "__main__":
    main()
