"""Trainer smoke tests on tiny shapes (CPU).

The training loops are otherwise exercised only by the real TPU recipes;
these pin the API contract (config validation, checkpoint layout, resume,
freeze_bn) at toy scale.
"""
import json
import pathlib

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_b0_cfg():
    return dict(
        # batch 8: the conftest pins an 8-device CPU mesh and batches
        # shard over it; crop 64 keeps the compute toy-sized
        crop=64, batch_size=8, steps_per_epoch=1, num_epochs=1,
        val_steps=1, alpha=[0.4], val_alpha=[0.4], learning_rate=1e-4,
        patience=5, seed=1,
    )


def test_train_b0_freeze_bn_smoke(tmp_path, reference_root, tiny_b0_cfg):
    from wsunet_tpu.train.train_b0 import train

    exp = train({**tiny_b0_cfg, "freeze_bn": True},
                reference_root / "data", tmp_path)
    assert (exp / "model" / "best").exists()
    with open(exp / "config.json") as f:
        assert json.load(f)["freeze_bn"] is True
    # frozen stats: batch_stats in the checkpoint equal the init stats
    from wsunet_tpu.train.checkpoint import load_checkpoint
    state = load_checkpoint(exp, None, "best")
    means = [np.asarray(x) for x in
             __import__("jax").tree.leaves(state["batch_stats"])]
    assert any((m == 0).all() for m in means)  # init means never mutated


def test_train_b0_resume_smoke(tmp_path, reference_root, tiny_b0_cfg):
    from wsunet_tpu.train.train_b0 import train

    first = train(dict(tiny_b0_cfg), reference_root / "data", tmp_path)
    second = train({**tiny_b0_cfg, "resume": first.name},
                   reference_root / "data", tmp_path)
    assert (second / "model" / "best").exists()
    assert second != first


@pytest.mark.skipif("WSUNET_SLOW_TESTS" not in __import__("os").environ,
                    reason="~7 min on the 1-core CI host (512^2 forwards); "
                           "run with WSUNET_SLOW_TESTS=1 (passed 2026-08-17)")
def test_bn_recalibrate_smoke(tmp_path, reference_root, tiny_b0_cfg):
    """Recalibration must refresh batch_stats without touching params and
    register an evaluable -bnrecal sibling run."""
    import jax
    from wsunet_tpu.train.train_b0 import train
    from wsunet_tpu.train.checkpoint import load_checkpoint
    from scripts.bn_recalibrate import recalibrate

    exp = train(dict(tiny_b0_cfg), reference_root / "data", tmp_path)
    dst = recalibrate(tmp_path, "LSBR", exp.name, num_batches=2,
                      batch_size=2)
    assert dst.name == exp.name + "-bnrecal"
    before = load_checkpoint(exp, None, "best")
    after = load_checkpoint(dst, None, "best")
    for a, b in zip(jax.tree.leaves(before["params"]),
                    jax.tree.leaves(after["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    diffs = [float(abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(before["batch_stats"]),
                             jax.tree.leaves(after["batch_stats"]))]
    assert max(diffs) > 0.0  # stats actually moved
