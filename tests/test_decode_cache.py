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
