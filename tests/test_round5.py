"""Round-5 chain/supervisor/finisher decision logic.

Same rationale as tests/test_round4_supervise.py: the resume decisions
guard hours of TPU training, so the marker parsing is pinned against
real chain-log shapes — including the mid-round stage reorder this
round performed (the TERMINAL order is load-bearing for --start).
"""
import importlib.util
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, REPO / f"scripts/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_terminal_order_matches_stage_functions():
    chain = _load("round5_chain")
    tags = [f.__name__.replace("stage_", "").replace("_", "-")
            for f in chain.STAGES]
    assert tags == chain.TERMINAL


def test_supervisor_resume_index_follows_reordered_terminals():
    sup = _load("round5_supervise")
    chain = _load("round5_chain")
    text = ""
    for i, tag in enumerate(chain.TERMINAL):
        assert sup.resume_index(text) == i
        text += f"STAGE-DONE {tag}: run-{i}\n"
    assert sup.resume_index(text) == len(chain.TERMINAL)
    # sub-stage markers alone must NOT advance the index
    assert sup.resume_index("STAGE-DONE unet-lsbr-folda-w-s1: x\n") == 0


def test_chain_done_rescans_older_markers(tmp_path, monkeypatch):
    """ADVICE r4: if the newest marker's run was wiped (container reset)
    but an older one survives in a committed zoo, resume from it instead
    of retraining."""
    chain = _load("round5_chain")
    log = tmp_path / "round5_chain.log"
    log.write_text("STAGE-DONE abl-p16: run-old\n"
                   "STAGE-DONE abl-p16: run-new\n")
    monkeypatch.setattr(chain, "LOG", log)
    surviving = {"run-old": tmp_path / "zoo/run-old"}
    monkeypatch.setattr(chain, "_find_run",
                        lambda run: surviving.get(run))
    assert chain._done("abl-p16") == "run-old"
    surviving["run-new"] = tmp_path / "zoo/run-new"
    assert chain._done("abl-p16") == "run-new"
    assert chain._done("abl-p64") is None


def test_finisher_skips_unfinished_stages(tmp_path, monkeypatch, capsys):
    fin = _load("round5_finish")
    log = tmp_path / "round5_chain.log"
    log.write_text("STAGE-DONE unet-lsbr-folda-w: run-a\n")
    monkeypatch.setattr(fin, "LOG", log)
    monkeypatch.setattr(fin, "_find_run",
                        lambda run: tmp_path if run == "run-a" else None)
    assert fin._terminal_done("unet-lsbr-folda-w") == "run-a"
    assert fin._terminal_done("unet-lsbr-foldb-w") is None
    assert fin._terminal_done("abl-p16") is None


def test_hillr_seed_requires_finished_lsbr_stage(monkeypatch, tmp_path):
    chain = _load("round5_chain")
    monkeypatch.setattr(chain, "LOG", tmp_path / "nope.log")
    with pytest.raises(RuntimeError, match="no finished run"):
        chain._hillr_seed("unet-lsbr-folda-w")
