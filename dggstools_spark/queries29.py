"""Driver-contract queries, batch 33 (round 6): Mann-Kendall trend,
G-function nearest-neighbor distribution, and flow accumulation.

- ``mk_trend``: per-cell Mann-Kendall S over daily event counts — the
  rank-based sibling of cell_trends' OLS slope (robust to outliers /
  monotone-nonlinear growth); exact integer S, tie-corrected 18·Var and
  tau-a ppm (operators/trend.mk_trend).
- ``g_function``: nearest-occupied-neighbor ring-distance CDF over the
  document cells — the cheap point-pattern statistic next to ripley_k's
  pair counts (operators/pointpat.g_function; censoring observable).
- ``flow_accum``: upstream drainage counts of the batch-32 terrain via
  transitive-closure squaring of the D8 flow pointer, ranked top-k — the
  stream-network statistic (operators/hydro.flow_accum).

Constraint-2 discipline as in queries28: the encoder output crosses a
``localCheckpoint`` before any multi-reference join.
"""

from __future__ import annotations

import math
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .functions import encode_sql
from .queries3 import load
from .queries28 import WS_RES, _terrain, _terrain_sql
from .sources import synth

QUERIES29: "dict[str, Callable[[SparkSession, str], DataFrame]]" = {}
ORACLES29: "dict[str, str]" = {}

MK_RES = 2
MK_K = 20
GF_RES = 3
GF_KMAX = 3
FA_K = 30


def q_mk_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.trend import mk_trend

    ev = synth.with_lonlat(load(spark, sf_dir, "events"), "event_id")
    obs = (encode_sql.spark_encode(ev, "lon", "lat", MK_RES)
           .select("cellid",
                   F.expr("unix_millis(CAST(ts AS TIMESTAMP))"
                          " div 86400000").alias("day"),
                   F.lit(1).cast("bigint").alias("y"))
           .localCheckpoint(eager=True))  # constraint 2: the pair
    # self-join + three per-key aggs reference cellid five times
    return mk_trend(obs, "cellid", "day", "y", MK_K)


def _oracle_mk_trend() -> str:
    from .operators.trend import mk_trend_sql

    src = synth.duckdb_lonlat_select("events", "event_id",
                                     ["event_id", "ts"])
    enc = encode_sql.duckdb_encode_select(f"({src})", "lon", "lat",
                                          MK_RES, ["ts"])
    obs = (f"SELECT cellid, epoch_ms(ts) // 86400000 AS day,"
           f" CAST(1 AS BIGINT) AS y FROM ({enc})")
    return mk_trend_sql(obs, "cellid", "day", "y", MK_K)


QUERIES29["mk_trend"] = q_mk_trend
ORACLES29["mk_trend"] = _oracle_mk_trend()


def q_g_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.pointpat import g_function

    docs = synth.with_lonlat(load(spark, sf_dir, "documents"), "doc_id")
    cells = (encode_sql.spark_encode(docs, "lon", "lat", GF_RES)
             .select("cellid").distinct()
             .localCheckpoint(eager=True))
    return g_function(cells, GF_RES, GF_KMAX)


def _oracle_g_function() -> str:
    from .operators.pointpat import g_function_sql

    src = synth.duckdb_lonlat_select("documents", "doc_id", ["doc_id"])
    enc = encode_sql.duckdb_encode_select(f"({src})", "lon", "lat",
                                          GF_RES, ["doc_id"])
    occ = f"SELECT DISTINCT cellid FROM ({enc})"
    return g_function_sql(occ, GF_RES, GF_KMAX)


QUERIES29["g_function"] = q_g_function
ORACLES29["g_function"] = _oracle_g_function()


def q_flow_accum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from .operators.hydro import elev_range, flow_accum

    d = max(1, math.ceil(math.log2(elev_range(WS_RES) + 1)))
    acc = flow_accum(_terrain(spark, sf_dir), WS_RES, d)
    rw = Window.orderBy(F.desc("acc"), F.asc("cellid"))
    return (acc.withColumn("rank", F.row_number().over(rw))
            .filter(F.col("rank") <= FA_K)
            .select("cellid", "acc", "rank"))


def _oracle_flow_accum() -> str:
    from .operators.hydro import elev_range, flow_accum_ctes

    d = max(1, math.ceil(math.log2(elev_range(WS_RES) + 1)))
    return f"""
    WITH {flow_accum_ctes(_terrain_sql(), WS_RES, d)}
    SELECT cellid, acc, CAST(rank AS INT) AS rank
    FROM (SELECT *, row_number() OVER (
              ORDER BY acc DESC, cellid) AS rank FROM faccum)
    WHERE rank <= {FA_K}
    """


QUERIES29["flow_accum"] = q_flow_accum
ORACLES29["flow_accum"] = _oracle_flow_accum()


# --------------------------------------------------------------------------
# q_emerging_hotspots (batch 36): space-time Getis-Ord trajectory
# classification — per-day Gi ratios over event cells, Mann-Kendall
# trend of each cell's ratio series, ESRI-style integer-exact category
# labels (operators/spacetime.py).
# --------------------------------------------------------------------------

EH_RES = 2
EH_K = 25


def q_emerging_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.spacetime import emerging_hotspots

    ev = synth.with_lonlat(load(spark, sf_dir, "events"), "event_id")
    obs = (encode_sql.spark_encode(ev, "lon", "lat", EH_RES)
           .select("cellid",
                   F.expr("unix_millis(CAST(ts AS TIMESTAMP))"
                          " div 86400000").alias("day"))
           .groupBy("cellid", "day")
           .agg(F.count("*").cast("bigint").alias("v"))
           .localCheckpoint(eager=True))  # constraint 2: lattice decode
    # + focal join + totals + MK pair join all re-reference cellid
    return emerging_hotspots(obs, EH_RES, EH_K)


def _oracle_emerging_hotspots() -> str:
    from .operators.spacetime import emerging_hotspots_sql

    src = synth.duckdb_lonlat_select("events", "event_id",
                                     ["event_id", "ts"])
    enc = encode_sql.duckdb_encode_select(f"({src})", "lon", "lat",
                                          EH_RES, ["ts"])
    obs = (f"SELECT cellid, epoch_ms(ts) // 86400000 AS day,"
           f" CAST(count(*) AS BIGINT) AS v FROM ({enc})"
           f" GROUP BY cellid, epoch_ms(ts) // 86400000")
    return emerging_hotspots_sql(obs, EH_RES, EH_K)


QUERIES29["emerging_hotspots"] = q_emerging_hotspots
ORACLES29["emerging_hotspots"] = _oracle_emerging_hotspots()
