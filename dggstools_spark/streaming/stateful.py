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
