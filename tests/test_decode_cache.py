"""Decode-cache correctness, including the prefetch=2 concurrency the
eval sweeps use (two ``_decode_many(cache=True)`` workers in flight —
the byte accounting must stay exact under that race).
"""
import pathlib
import threading

import numpy as np
import pytest

from wsunet_tpu.data import pipeline
from wsunet_tpu.io.imread import imread_gray_u8

DATA = pathlib.Path("/root/reference/data/images")


@pytest.fixture(autouse=True)
def _fresh_cache():
    pipeline.clear_decode_cache()
    yield
    pipeline.clear_decode_cache()


def _paths():
    ps = sorted(DATA.glob("*.png"))
    assert ps, "fixture covers missing"
    return ps


def test_cache_hit_returns_same_arrays():
    ps = _paths()
    first = pipeline._decode_many(ps, imread_gray_u8, 1, cache=True)
    second = pipeline._decode_many(ps, imread_gray_u8, 1, cache=True)
    for a, b in zip(first, second):
        assert a is b  # served from cache, not re-decoded
    expected = sum(v.nbytes for v in pipeline._DECODE_CACHE.values()
                   if v is not None)
    assert pipeline._DECODE_CACHE_BYTES == expected


def test_concurrent_fill_accounts_bytes_exactly_once():
    ps = _paths()
    barrier = threading.Barrier(2)
    results = []

    def fill():
        barrier.wait()
        out = pipeline._decode_many(ps, imread_gray_u8, 1, cache=True)
        results.append(out)

    threads = [threading.Thread(target=fill) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert len(results) == 2
    for out in results:
        assert all(isinstance(o, np.ndarray) for o in out)
    # the counter must equal the true cache contents: a lost update
    # undercounts (cache overruns its budget), a double insert of the
    # same keys overcounts (cache stops filling early)
    expected = sum(v.nbytes for v in pipeline._DECODE_CACHE.values()
                   if v is not None)
    assert pipeline._DECODE_CACHE_BYTES == expected


def test_over_budget_serves_uncached_without_counter_growth(monkeypatch):
    ps = _paths()
    monkeypatch.setattr(pipeline, "_DECODE_CACHE_BUDGET", 1)
    out = pipeline._decode_many(ps, imread_gray_u8, 1, cache=True)
    assert all(isinstance(o, np.ndarray) for o in out)
    assert pipeline._DECODE_CACHE_BYTES == 0
    assert not pipeline._DECODE_CACHE

# --- device batch cache (eval-sweep repeat passes) -----------------------

def _catalog():
    import pandas as pd
    names = [p.name for p in _paths()]
    return pd.DataFrame({"name": [f"images/{n}" for n in names]})


def test_device_cache_repeat_pass_yields_same_device_array():
    import jax
    root = pathlib.Path("/root/reference/data")
    df = _catalog()
    first = list(pipeline.iterate_batches(root, df, 4, cache=True,
                                          device_cache=True))
    second = list(pipeline.iterate_batches(root, df, 4, cache=True,
                                           device_cache=True))
    assert len(first) == len(second) >= 1
    for a, b in zip(first, second):
        assert isinstance(b.pixels, jax.Array)
        assert b.pixels is a.pixels  # served from the device cache
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    # padded tail batches cache too (padding is deterministic), and the
    # pixel bits must equal the plain host path exactly
    plain = list(pipeline.iterate_batches(root, df, 4))
    for a, p in zip(second, plain):
        np.testing.assert_array_equal(np.asarray(a.pixels), p.pixels)
        np.testing.assert_array_equal(a.mask, p.mask)
    expected = sum(v[0].nbytes for v in pipeline._DEVICE_CACHE.values())
    assert pipeline._DEVICE_CACHE_BYTES == expected


def test_device_cache_skips_batches_with_failed_decodes(tmp_path):
    import pandas as pd
    import shutil
    src = _paths()[0]
    (tmp_path / "images").mkdir()
    shutil.copy(src, tmp_path / "images" / "ok.png")
    (tmp_path / "images" / "bad.png").write_bytes(b"not a png")
    df = pd.DataFrame({"name": ["images/ok.png", "images/bad.png"]})
    out = list(pipeline.iterate_batches(tmp_path, df, 2, cache=True,
                                        device_cache=True))
    assert len(out) == 1
    assert list(out[0].mask) == [True, False]
    assert not pipeline._DEVICE_CACHE  # failure -> never device-cached
    # a second pass still yields the same (host) result
    out2 = list(pipeline.iterate_batches(tmp_path, df, 2, cache=True,
                                         device_cache=True))
    np.testing.assert_array_equal(np.asarray(out[0].pixels),
                                  np.asarray(out2[0].pixels))


def test_device_cache_respects_budget(monkeypatch):
    root = pathlib.Path("/root/reference/data")
    df = _catalog()
    monkeypatch.setattr(pipeline, "_DEVICE_CACHE_BUDGET", 1)
    out = list(pipeline.iterate_batches(root, df, 4, cache=True,
                                        device_cache=True))
    assert out and not pipeline._DEVICE_CACHE
    assert pipeline._DEVICE_CACHE_BYTES == 0
