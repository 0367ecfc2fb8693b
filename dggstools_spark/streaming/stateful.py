"""Custom stateful streaming operator via applyInPandasWithState.

``running_tile_counts`` keeps one state row per tile (total docs seen so
far + number of micro-batches that touched the tile) and emits the updated
running totals each batch — the canonical "custom stateful operator"
pattern the built-in windowed aggregations can't express (state survives
across event-time windows and never ages out).

Determinism contract used by the oracle-checked driver query: the FINAL
running total per tile equals the batch group-count regardless of how the
file source splits micro-batches, so `max(total)` per tile over the
append-mode sink is batch-split-independent.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (IntegerType, LongType, StringType, StructField,
                               StructType)

from ..dggs.config import RHEALPixConfig, DEFAULT_CONFIG
from ..functions.encode import cellid_from_lonlat_udf

OUTPUT_SCHEMA = StructType([
    StructField("tile", StringType()),
    StructField("total_docs", LongType()),
    StructField("n_batches", IntegerType()),
])

STATE_SCHEMA = StructType([
    StructField("total", LongType()),
    StructField("batches", IntegerType()),
])


def _update(key: Tuple[str], batches: Iterable[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    n = 0
    for pdf in batches:
        n += len(pdf)
    if state.exists:
        total, nb = state.get
    else:
        total, nb = 0, 0
    total += n
    nb += 1
    state.update((total, nb))
    yield pd.DataFrame({"tile": [key[0]], "total_docs": [total],
                        "n_batches": [nb]})


def running_tile_counts(docs: DataFrame, res: int = 5, tile_res: int = 2,
                        cfg: RHEALPixConfig = DEFAULT_CONFIG) -> DataFrame:
    """Streaming docs (lon, lat, ...) -> per-tile running totals with
    explicit state (applyInPandasWithState, update mode, no timeout)."""
    enc = cellid_from_lonlat_udf(res, cfg)
    assigned = (docs.withColumn("cellid", enc("lon", "lat"))
                .withColumn("tile", F.substring("cellid", 1, tile_res + 1)))
    return assigned.groupBy("tile").applyInPandasWithState(
        _update, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)


# --------------------------------------------------------------------------
# Streaming heavy hitters: SpaceSaving (Metwally et al. 2005, public
# algorithm) per key group, state crossing micro-batches.
#
# Deterministic variant: incoming batch rows are pre-aggregated to
# (token, weight) and applied in (weight desc, token asc) order —
# classic SpaceSaving is arrival-order-dependent, and rows reaching the
# state function after a shuffle have no stable order, so the in-batch
# application order is FIXED by rule; eviction picks the minimum-count
# monitored item, ties to the LEXICOGRAPHICALLY LARGEST token (any fixed
# rule works; this one keeps smaller tokens, matching the top-k
# finisher's asc tie order).  Weighted update: a new item replacing the
# min m takes count m.count + w, err m.count — the standard guarantee
# (true_count ≤ count ≤ true_count + err; every item with true count
# > N/capacity is monitored) holds per micro-batch application.
#
# With capacity ≥ distinct tokens the sketch IS exact counting (err 0,
# batch-split-independent) — that regime is the oracle-checked driver
# query; the bounded-capacity guarantees ride pytest (the stream_hll
# gating pattern).  State is bounded at capacity rows per key group —
# the whole point at 100 TB: constant memory per key, one shuffle per
# micro-batch, no full-vocabulary state.
# --------------------------------------------------------------------------

HH_OUTPUT = StructType([
    StructField("skey", StringType()),
    StructField("token", StringType()),
    StructField("cnt", LongType()),
    StructField("err", LongType()),
    StructField("version", IntegerType()),
])

from pyspark.sql.types import ArrayType  # noqa: E402

HH_STATE = StructType([
    StructField("toks", ArrayType(StringType())),
    StructField("cnts", ArrayType(LongType())),
    StructField("errs", ArrayType(LongType())),
    StructField("batches", IntegerType()),
])


def _hh_make_update(capacity: int):
    def _update(key: Tuple[str], batches: Iterable[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        agg: dict = {}
        for pdf in batches:
            for t, c in pdf["token"].value_counts().items():
                agg[t] = agg.get(t, 0) + int(c)
        if state.exists:
            toks, cnts, errs, nb = state.get
            ss = {t: [c, e] for t, c, e in zip(toks, cnts, errs)}
        else:
            ss, nb = {}, 0
        for t, w in sorted(agg.items(), key=lambda kv: (-kv[1], kv[0])):
            if t in ss:
                ss[t][0] += w
            elif len(ss) < capacity:
                ss[t] = [w, 0]
            else:
                mt = min(ss.items(),
                         key=lambda kv: (kv[1][0], _rev(kv[0])))[0]
                mc = ss.pop(mt)[0]
                ss[t] = [mc + w, mc]
        nb += 1
        items = sorted(ss.items(), key=lambda kv: (-kv[1][0], kv[0]))
        state.update(([t for t, _ in items],
                      [v[0] for _, v in items],
                      [v[1] for _, v in items], nb))
        yield pd.DataFrame({
            "skey": [key[0]] * len(items),
            "token": [t for t, _ in items],
            "cnt": [v[0] for _, v in items],
            "err": [v[1] for _, v in items],
            "version": [nb] * len(items)})
    return _update


class _Rev(str):
    """Reverses string comparison (for the max-token eviction tie)."""
    def __lt__(self, other):  # pragma: no cover - trivial
        return str.__gt__(self, other)


def _rev(s: str) -> "_Rev":
    return _Rev(s)


def heavy_hitters_stream(rows: DataFrame, key_col: str, token_col: str,
                         capacity: int) -> DataFrame:
    """Streaming SpaceSaving over (key, token) rows: emits the FULL
    current summary per key each micro-batch, stamped with a
    monotonically increasing ``version`` so a finisher can select the
    final state (max version per key)."""
    if capacity < 1:
        raise ValueError(
            f"heavy_hitters_stream: capacity must be >= 1,"
            f" got {capacity}")
    keyed = rows.select(F.col(key_col).alias("skey"),
                        F.col(token_col).alias("token"))
    return keyed.groupBy("skey").applyInPandasWithState(
        _hh_make_update(capacity), HH_OUTPUT, HH_STATE, "update",
        GroupStateTimeout.NoTimeout)
