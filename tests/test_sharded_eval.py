"""Mesh-sharded eval sweeps (VERDICT r4 item 1): the REAL library entry
points — ws.estimate.run, ws.unet_eval.run, detect.b0_eval.run — must
produce row-for-row identical frames on a 1-device mesh and on the full
8-virtual-device CPU mesh (tests/conftest.py forces 8 devices), because
batch-axis sharding never changes any within-image reduction.

The 1-device baseline goes through parallel.set_eval_devices(1) — the
same code path a single-chip TPU takes — so both sweeps run through the
identical library code, not a hand-built step."""
import pathlib

import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd
import pytest

from wsunet_tpu.parallel import (
    allgather_rows, jit_sharded, place, round_batch, set_eval_devices)
from wsunet_tpu.data.pipeline import clear_decode_cache

DATA = pathlib.Path("/root/reference/data")
REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(autouse=True)
def _reset_eval_devices():
    yield
    set_eval_devices(None)
    clear_decode_cache()


def _both_meshes(fn):
    set_eval_devices(1)
    single = fn()
    clear_decode_cache()  # device-cached batches carry their sharding
    set_eval_devices(None)
    assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"
    full = fn()
    return single, full


def test_round_batch():
    set_eval_devices(None)
    assert round_batch(8) == 8
    assert round_batch(5) == 8
    assert round_batch(9) == 16
    set_eval_devices(1)
    assert round_batch(5) == 5


def test_jit_sharded_matches_plain():
    x = np.arange(8 * 6 * 6, dtype=np.float32).reshape(8, 6, 6)
    def step(p):
        return jnp.mean(p * p, axis=(1, 2))
    set_eval_devices(None)
    got = np.asarray(jit_sharded(step)(place(x)))
    np.testing.assert_array_equal(got, np.asarray(jax.jit(step)(x)))
    # the shard_map variant (the fused-Pallas partitioning route) must
    # agree as well — per-device execution of a per-image map
    got_sm = np.asarray(jit_sharded(step, via_shard_map=True)(place(x)))
    np.testing.assert_array_equal(got_sm, got)


def test_allgather_rows_single_process_passthrough():
    v = np.array([1.0, 2.0, 3.0])
    assert allgather_rows(v, 3) is v


def test_ws_run_sharded_equals_single():
    """ws.estimate.run (KB filter + weighted variant + OLS) over the
    fixture: 8-device rows must equal 1-device rows exactly."""
    from wsunet_tpu.ws.estimate import run

    def sweep():
        frames = [run(DATA, "LSBR", 0.1, m, batch_size=4)
                  for m in ("KB", "KB-w", "OLS")]
        frames.append(run(DATA, None, None, "KB", batch_size=4))
        return pd.concat(frames).reset_index(drop=True)

    single, full = _both_meshes(sweep)
    pd.testing.assert_frame_equal(single, full)
    assert len(full) == 20  # 3 models x 5 stego + 1 cover pass


def test_unet_run_sharded_equals_single():
    """ws.unet_eval.run through the committed fold-A UNet."""
    from wsunet_tpu.ws.unet_eval import run

    def sweep():
        return run(DATA, REPO / "models/unet", "LSBR",
                   eval_methods=("LSBR",), batch_size=4,
                   take_num_images=2)

    single, full = _both_meshes(sweep)
    pd.testing.assert_frame_equal(single, full)
    assert {"beta_hat", "l1"} <= set(full.columns)


def test_b0_run_sharded_equals_single():
    """detect.b0_eval.run through a committed fold-A B0."""
    from wsunet_tpu.detect.b0_eval import run

    def sweep():
        return run(DATA, REPO / "models/b0", "LSBR",
                   eval_methods=("LSBR",), batch_size=4,
                   take_num_images=2)

    single, full = _both_meshes(sweep)
    pd.testing.assert_frame_equal(single, full)
    assert full["output"].notna().all()
