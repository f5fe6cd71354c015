"""Retry/backoff helper (reference network_helpers.py:24-98)."""

import random

import pytest

from graphragpart1datapipeline_spark.sources import retry_call, with_retries


def _flaky(n_failures, exc=ValueError):
    state = {"calls": 0}

    def fn():
        state["calls"] += 1
        if state["calls"] <= n_failures:
            raise exc(f"transient #{state['calls']}")
        return "ok"

    fn.state = state
    return fn


def test_retry_succeeds_after_transient_failures():
    sleeps = []
    fn = _flaky(3)
    out = retry_call(
        fn, retries=5, base_delay=1.0, backoff=2.0, jitter=0.0,
        sleep=sleeps.append,
    )
    assert out == "ok"
    assert fn.state["calls"] == 4
    # exponential: 1, 2, 4 (no jitter)
    assert sleeps == [1.0, 2.0, 4.0]


def test_retry_exhaustion_reraises_original():
    sleeps = []
    with pytest.raises(ValueError, match="transient #3"):
        retry_call(_flaky(99), retries=2, jitter=0.0, sleep=sleeps.append)
    assert len(sleeps) == 2  # no sleep after the final attempt


def test_retry_delay_cap_and_jitter_bounds():
    sleeps = []
    retry_call(
        _flaky(6), retries=6, base_delay=1.0, backoff=2.0, max_delay=5.0,
        jitter=0.1, sleep=sleeps.append, rng=random.Random(42),
    )
    assert len(sleeps) == 6
    # every delay within ±10% of min(2**i, 5)
    for i, d in enumerate(sleeps):
        nominal = min(2.0**i, 5.0)
        assert nominal * 0.9 <= d <= nominal * 1.1


def test_retry_on_filters_exception_types():
    def boom():
        raise KeyError("not transient")

    with pytest.raises(KeyError):
        retry_call(boom, retries=5, retry_on=(ValueError,), sleep=lambda _: None)


def test_with_retries_wraps_injected_fetcher(spark, tmp_path):
    import pandas as pd

    from graphragpart1datapipeline_spark.sources import fetch_with_cache

    # per-task transient failure: each executor worker's first call
    # raises, the wrapper's retry succeeds — the seam the reference
    # covers with its flaky-HTTP fake
    def fetcher(keys):
        state = fetcher.__dict__.setdefault("calls", [0])
        state[0] += 1
        if state[0] == 1:
            raise ValueError("transient")
        return pd.DataFrame({"qid": keys, "label": [k.upper() for k in keys]})

    wrapped = with_retries(fetcher, retries=3, base_delay=0.0, jitter=0.0)
    keys = spark.createDataFrame([("a",), ("b",)], "qid string")
    cache = spark.createDataFrame([], "qid string, label string")
    out = fetch_with_cache(
        keys, cache, "qid", wrapped, "qid string, label string"
    )
    assert {(r["qid"], r["label"]) for r in out.collect()} == {
        ("a", "A"), ("b", "B")
    }
