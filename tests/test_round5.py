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


def _abl_df():
    import pandas as pd
    rows = []
    pts = {2: (1.000, 0.667), 3: (0.852, 0.583), 4: (0.688, 0.667),
           16: (0.900, 0.700), 64: (0.950, 0.750)}
    for n, (ins, hold) in pts.items():
        for kind, auc in (("in-sample", ins), ("holdout", hold)):
            rows.append(dict(
                n_train_covers=n, train_covers=f"{{{n}c}}",
                eval_covers="{10}", eval_kind=kind, run=f"run-{n}",
                auc=auc, p_e=0.2, auc_lo=max(0.0, auc - 0.3),
                auc_hi=min(1.0, auc + 0.3), auc_a001=auc,
                p_e_a001=0.2, source="test"))
    return pd.DataFrame(rows)


def test_ablation_doc_prose_follows_the_table(tmp_path, monkeypatch):
    """The r4 verdict dinged B0_DATA_BOUND twice for prose contradicting
    its own table; the round-5 publisher derives the contrast sentences
    FROM the dataframe, so a changed table changes the prose with it."""
    abl = _load("round5_ablation")
    monkeypatch.setattr(abl, "DOC_OUT", tmp_path / "doc.md")
    monkeypatch.setattr(abl, "REPO", tmp_path)
    (tmp_path / "README.md").write_text("no markers here\n")
    monkeypatch.setattr(abl, "_golden_b0", lambda: (0.880, 0.200))

    df = _abl_df()
    abl.publish(df)
    doc = (tmp_path / "doc.md").read_text()
    assert "n=2: 1.000 in-sample vs 0.667 holdout" in doc
    assert "n=3: 0.852 in-sample vs 0.583 holdout" in doc
    # n=4 synthetic row: in-sample ~ holdout, CI spans chance -> the
    # inconclusive reading, quoting the row's own numbers
    assert "n=4 point is inconclusive" in doc
    assert "0.688 in-sample vs 0.667 holdout" in doc
    # README without markers is left untouched
    assert (tmp_path / "README.md").read_text() == "no markers here\n"

    # a table where n=4 separates cleanly flips the prose
    df2 = df.copy()
    df2.loc[(df2.n_train_covers == 4) & (df2.eval_kind == "in-sample"),
            "auc"] = 0.99
    df2.loc[(df2.n_train_covers == 4) & (df2.eval_kind == "holdout"),
            ["auc", "auc_lo", "auc_hi"]] = [0.70, 0.55, 0.85]
    abl.publish(df2)
    doc2 = (tmp_path / "doc.md").read_text()
    assert "n=4 point now shows the same contrast" in doc2
    assert "0.990 in-sample vs 0.700 holdout" in doc2


def test_unet_stage_markers_carry_run_names_not_paths(tmp_path, monkeypatch,
                                                      capsys):
    """_train_unet returns the experiment-dir Path; the 07:32 UTC
    incremental swap silently skipped fold A because its terminal marker
    carried the full path, which _find_run cannot resolve.  unet_anchor
    must log bare run names."""
    chain = _load("round5_chain")
    run_dir = tmp_path / "unet/LSBR/260819-test-run_"
    run_dir.mkdir(parents=True)
    monkeypatch.setattr(chain, "LOG", tmp_path / "chain.log")
    monkeypatch.setattr(chain, "_train_unet", lambda cfg: run_dir)
    out = chain.unet_anchor({"num_epochs": 1}, "unet-lsbr-folda-w")
    assert out == "260819-test-run_"
    logged = capsys.readouterr().out
    assert "STAGE-DONE unet-lsbr-folda-w: 260819-test-run_" in logged
    assert str(tmp_path) not in logged


def test_supervisor_detects_wedged_chain_by_log_age(tmp_path, monkeypatch):
    """A wedged axon connection leaves the chain alive-but-silent, which
    chain_alive() cannot see; the supervisor treats a long-quiet log as
    a hang (2026-08-19 relay outages wedged the chain twice)."""
    import os
    import time as _time
    sup = _load("round5_supervise")
    log = tmp_path / "chain.log"
    monkeypatch.setattr(sup, "LOG", log)
    assert not sup.chain_stalled()          # no log yet -> not stalled
    log.write_text("Epoch: [1]\n")
    assert not sup.chain_stalled()          # fresh log -> healthy
    old = _time.time() - sup.CHAIN_QUIET_LIMIT_S - 5
    os.utime(log, (old, old))
    assert sup.chain_stalled()              # silent past the limit


def test_finisher_step_times_out_and_retries_on_cpu(tmp_path, monkeypatch):
    """A mid-run relay wedge must not hang the unattended end-game: the
    step subprocess is killed at its timeout and retried with --cpu."""
    fin = _load("round5_finish")
    script = tmp_path / "step.py"
    script.write_text(
        "import sys, time\n"
        "if '--cpu' in sys.argv:\n"
        "    sys.exit(0)\n"
        "time.sleep(60)\n")
    monkeypatch.setattr(fin, "REPO", tmp_path)
    rc = fin._step(str(script), cpu=False, timeout_s=2,
                   cpu_retry_timeout_s=30)
    assert rc == 0  # TPU attempt killed at 2s; CPU retry succeeded
    rc2 = fin._step(str(script), cpu=True, timeout_s=60)
    assert rc2 == 0  # cpu=True passes --cpu on the first attempt


def test_ablation_trend_prose_covers_rank_lift_and_saturation(tmp_path,
                                                              monkeypatch):
    """The out-of-sample trend sentence must follow the best PATCH point
    (not just n_max) and flag a rank-only lift when its P_E shows
    saturated scores."""
    abl = _load("round5_ablation")
    monkeypatch.setattr(abl, "DOC_OUT", tmp_path / "doc.md")
    monkeypatch.setattr(abl, "REPO", tmp_path)
    (tmp_path / "README.md").write_text("x\n<!-- b0-bound:start -->\n"
                                        "old\n<!-- b0-bound:end -->\ny\n")
    monkeypatch.setattr(abl, "_golden_b0", lambda: (0.880, 0.200))

    df = _abl_df()
    # n=16 rank-perfect but saturated (P_E 0.5); n=64 modest
    m16h = (df.n_train_covers == 16) & (df.eval_kind == "holdout")
    df.loc[m16h, ["auc", "auc_lo", "auc_hi", "p_e"]] = [1.0, 1.0, 1.0, 0.5]
    abl.publish(df)
    doc = (tmp_path / "doc.md").read_text()
    assert "lifts at the patch points (best: n=16, AUC 1.000" in doc
    assert "P_E 0.50 shows the scores are saturated" in doc
    readme = (tmp_path / "README.md").read_text()
    assert "AUC 1.000 (P_E 0.50) at n=16" in readme

    # clean lift (P_E low) -> no saturation caveat
    df.loc[m16h, "p_e"] = 0.0
    abl.publish(df)
    doc2 = (tmp_path / "doc.md").read_text()
    assert "lifts at the patch points (best: n=16, AUC 1.000)" in doc2
    assert "saturated" not in doc2.split("## Reading")[1].split("**The")[0] \
        or "saturated near a constant" not in doc2
