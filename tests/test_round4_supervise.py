"""The supervisor's resume decision guards hours of TPU training: a
wrong index either re-trains a finished stage or skips an unfinished
one.  Pin the marker parsing against real chain-log shapes."""
import importlib.util
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent


def _mod():
    spec = importlib.util.spec_from_file_location(
        "round4_supervise", REPO / "scripts/round4_supervise.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_resume_index_walks_terminal_markers():
    m = _mod()
    assert m.resume_index("") == 0
    assert m.resume_index("relay down; waiting for the axon tunnel...") == 0
    # mid-stage death: s2/s3 done but the stage's terminal marker absent
    partial = ("STAGE-START 0 stage_nsr_folda_cont\n"
               "STAGE-DONE nsr-folda-s2: 2608...\n"
               "STAGE-DONE nsr-folda-s3: 2608...\n")
    assert m.resume_index(partial) == 0
    done0 = partial + "STAGE-DONE nsr-folda-recal: x\n" \
                      "STAGE-DONE nsr-folda-final: x\n"
    assert m.resume_index(done0) == 1
    done1 = done0 + "STAGE-DONE hillr-b0-folda-final: x\n"
    assert m.resume_index(done1) == 2
    done2 = done1 + "STAGE-DONE unet-hillr-foldb: x\n"
    assert m.resume_index(done2) == len(m.STAGE_DONE)
    # stale CHAIN-ABORT lines from an expired gate must not matter
    assert m.resume_index("CHAIN-ABORT x: relay never came back\n"
                          + done1) == 2


def test_stage_markers_match_chain2_stages():
    """The marker list must stay in sync with round4_chain2.STAGES —
    a renamed stage would make the supervisor re-run finished work."""
    m = _mod()
    spec = importlib.util.spec_from_file_location(
        "round4_chain2", REPO / "scripts/round4_chain2.py")
    chain = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(chain)
    assert len(m.STAGE_DONE) == len(chain.STAGES)
    # each terminal marker's tag appears in its stage's source
    import inspect
    for marker, stage in zip(m.STAGE_DONE, chain.STAGES):
        tag = marker.split()[1].rstrip(":")
        src = inspect.getsource(stage)
        assert tag.split("-final")[0].split("-s2")[0] in src or \
            tag in src, (marker, stage.__name__)


def test_chain_alive_rejects_recycled_pid(tmp_path, monkeypatch):
    m = _mod()
    pidfile = tmp_path / "chain.pid"
    monkeypatch.setattr(m, "CHAIN_PID", pidfile)
    assert not m.chain_alive()  # no pid file
    pidfile.write_text("garbage")
    assert not m.chain_alive()  # unparsable
    import os
    pidfile.write_text(str(os.getpid()))  # live pid, wrong cmdline
    assert not m.chain_alive()


def test_incremental_swap_reports_swap_failure(tmp_path, monkeypatch):
    """A failed swap must return False (the supervisor retries next
    tick) and must not commit; a successful swap commits even when the
    commit itself is a no-op."""
    m = _mod()
    monkeypatch.setattr(m, "NOTES", tmp_path / "notes.log")
    calls = []

    def fake_call(cmd, **kw):
        calls.append(cmd)
        return 1 if "--swap-only" in cmd and fail else 0

    monkeypatch.setattr(m.subprocess, "call", fake_call)
    fail = True
    assert m.incremental_swap({"STAGE-DONE nsr-folda-final"}) is False
    assert not any(c[0] == "git" for c in calls)
    calls.clear()
    fail = False
    assert m.incremental_swap({"STAGE-DONE nsr-folda-final"}) is True
    assert ["git", "add", "models", "models_foldb"] in calls
    assert any(c[:2] == ["git", "commit"] for c in calls)


def test_chain2_done_marker_resumes_substages(tmp_path, monkeypatch):
    """A supervisor relaunch must recover finished sub-stage hand-off
    names from the log instead of re-training them."""
    spec = importlib.util.spec_from_file_location(
        "round4_chain2_t", REPO / "scripts/round4_chain2.py")
    chain = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(chain)
    monkeypatch.setattr(chain, "REPO", tmp_path)
    assert chain._done_marker("nsr-folda-s2") is None  # no log yet
    log = tmp_path / "logs"
    log.mkdir()
    (log / "round4_chain2.log").write_text(
        "STAGE-START 0 stage_nsr_folda_cont\n"
        "STAGE-DONE nsr-folda-s2: 260818-run-a\n"
        "STAGE-DONE nsr-folda-s2: 260818-run-b\n"  # latest wins
        "STAGE-DONE nsr-folda-recal: 260818-run-c\n")
    # markers only count when their staged run still exists (container
    # resets wipe the gitignored models_r3/ while the log survives in a
    # copy — resuming from a wiped run would crash the next sub-stage)
    for run in ("260818-run-b", "260818-run-c"):
        (tmp_path / "models_r3/b0/LSBR" / run).mkdir(parents=True)
    assert chain._done_marker("nsr-folda-s2") == "260818-run-b"
    assert chain._done_marker("nsr-folda-s3") is None
    assert chain._done_marker("nsr-folda-recal") == "260818-run-c"
    # stale marker: logged but the staging tree was wiped
    assert chain._done_marker("nsr-folda-s2") == "260818-run-b"
    import shutil
    shutil.rmtree(tmp_path / "models_r3/b0/LSBR/260818-run-b")
    assert chain._done_marker("nsr-folda-s2") is None
