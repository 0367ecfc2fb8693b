"""Batch 43 (round 6): SpaceSaving heavy hitters — sketch guarantees.

The update kernel is tested directly with a stub GroupState (the
streaming plumbing is gated end-to-end by the stream_topk driver
query): capacity bound, the count/err sandwich, heavy-hitter presence,
and exactness when capacity covers the vocabulary.
"""

import pandas as pd

from dggstools_spark.streaming.stateful import _hh_make_update


class _StubState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _apply(tokens_per_batch, capacity):
    st = _StubState()
    up = _hh_make_update(capacity)
    out = None
    for toks in tokens_per_batch:
        out = list(up(("s",), [pd.DataFrame({"token": toks})], st))[-1]
    return {r.token: (r.cnt, r.err) for r in out.itertuples()}


STREAM = (["a"] * 50 + ["b"] * 30 + ["c"] * 10 +
          [f"x{i}" for i in range(20)])


def test_hh_exact_when_capacity_covers_vocab(spark):
    got = _apply([STREAM], 1000)
    assert got["a"] == (50, 0) and got["b"] == (30, 0)
    assert got["c"] == (10, 0)
    assert all(e == 0 for _, e in got.values())
    assert len(got) == 23


def test_hh_capacity_bound_and_sandwich(spark):
    true = {}
    for t in STREAM:
        true[t] = true.get(t, 0) + 1
    got = _apply([STREAM], 5)
    assert len(got) == 5
    for t, (c, e) in got.items():
        assert true.get(t, 0) <= c <= true.get(t, 0) + e


def test_hh_heavy_hitters_present(spark):
    # every item with true count > N/capacity must be monitored
    n = len(STREAM)
    cap = 5
    got = _apply([STREAM], cap)
    true = {}
    for t in STREAM:
        true[t] = true.get(t, 0) + 1
    for t, c in true.items():
        if c > n / cap:
            assert t in got  # a, b (50, 30 > 110/5 = 22)


def test_hh_state_crosses_batches_exact(spark):
    whole = _apply([STREAM], 1000)
    split = _apply([STREAM[:40], STREAM[40:80], STREAM[80:]], 1000)
    assert whole == split
