"""Driver-contract queries, batch 16 (round 5): grid-native spatial
statistics — the analytics layer the DGGS cell keying exists for.

- focal_mean: 3×3 queen-window smoothing of per-cell doc counts (the
  same-resolution sibling of the rescale parent rollup), exact ppm;
- morans_i: global spatial autocorrelation of the cell-count surface
  under queen weights, floor-mean centered, exact integer arithmetic in
  DECIMAL(38,0)/HUGEINT.

Both run on the cell table produced by the expression-encode path (the
groupBy is the constraint-2 lineage boundary; the oracle MATERIALIZEs the
encode per constraint 7), and both reduce neighborhood topology to one
offset explode + one hash equi-join on (face, row, col).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .functions import encode_sql
from .queries3 import CELL_RES, load
from .sources import synth

QUERIES16: "dict[str, Callable[[SparkSession, str], DataFrame]]" = {}
ORACLES16: "dict[str, str]" = {}


def _cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = synth.with_lonlat(load(spark, sf_dir, "documents"), "doc_id")
    cells = (encode_sql.spark_encode(docs, "lon", "lat", CELL_RES)
             .groupBy("cellid")
             .agg(F.count("*").alias("v")))
    # constraint-2 lineage cut: focal/moran reference this frame on BOTH
    # sides of their neighbor join — without the cut, janino compiles the
    # ~50k-node expression-encoder stage once per branch (minutes each).
    # The cell table is aggregation output (cells ≪ points), so the
    # checkpoint is tiny.
    return cells.localCheckpoint(eager=True)


def _cells_sql() -> str:
    src = synth.duckdb_lonlat_select("documents", "doc_id", ["doc_id"])
    enc = encode_sql.duckdb_encode_select(f"({src})", "lon", "lat",
                                          CELL_RES, ["doc_id"])
    return f"SELECT cellid, count(*) AS v FROM ({enc}) GROUP BY cellid"


def q_focal_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.spatial_stats import focal_mean

    return focal_mean(_cells(spark, sf_dir), CELL_RES)


def _oracle_focal_mean() -> str:
    from .operators.spatial_stats import focal_mean_sql

    return focal_mean_sql(_cells_sql(), CELL_RES)


QUERIES16["focal_mean"] = q_focal_mean
ORACLES16["focal_mean"] = _oracle_focal_mean()


def q_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.spatial_stats import morans_i

    return morans_i(_cells(spark, sf_dir), CELL_RES)


def _oracle_morans_i() -> str:
    from .operators.spatial_stats import morans_i_sql

    return morans_i_sql(_cells_sql(), CELL_RES)


QUERIES16["morans_i"] = q_morans_i
ORACLES16["morans_i"] = _oracle_morans_i()
