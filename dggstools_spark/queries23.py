"""Driver-contract queries, batch 26 (round 6): graph centrality over the
flow network + distance-threshold spatial self-join.

- ``cell_rank``: integer PageRank over the OD corridor graph (events →
  res-2 cells → per-user moves → weighted edges → 5 power iterations in
  exact ppb arithmetic) — the "hub cells" of the movement corpus; the
  third iterative-algorithm family next to pointer-jumping CC and Lloyd
  refinement, oracle-checked via unrolled AS MATERIALIZED CTEs.
- ``near_pairs``: all document pairs within 75 km (planar contract) via
  the cell-block lattice — the spatial self-join primitive (cluster
  detection, duplicate-site finding) with a pruning guarantee proven
  against brute force in pytest.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .queries3 import load
from .queries22 import _flow_obs, _flow_obs_sql

QUERIES23: "dict[str, Callable[[SparkSession, str], DataFrame]]" = {}
ORACLES23: "dict[str, str]" = {}

RANK_ITERS = 5
RANK_K = 30


def q_cell_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.flows import od_flows
    from .operators.graph import page_rank

    # corridors without the top-k cut: the graph wants every edge, so k
    # is set to cover all pairs (res-2 cell count squared is the bound)
    flows = od_flows(_flow_obs(spark, sf_dir), "user_id", "tms",
                     "event_id", "cellid", k=10_000_000) \
        .localCheckpoint(eager=True)  # fixpoint input (constraint 2)
    return page_rank(flows.select("o_cell", "d_cell", "n_moves"),
                     "o_cell", "d_cell", "n_moves",
                     iters=RANK_ITERS, k=RANK_K)


def _oracle_cell_rank() -> str:
    from .operators.flows import od_flows_sql
    from .operators.graph import page_rank_sql

    flows = od_flows_sql(_flow_obs_sql(), "user_id", "tms", "event_id",
                         "cellid", k=10_000_000)
    return page_rank_sql(f"SELECT o_cell, d_cell, n_moves FROM ({flows})",
                         "o_cell", "d_cell", "n_moves",
                         iters=RANK_ITERS, k=RANK_K)


QUERIES23["cell_rank"] = q_cell_rank
ORACLES23["cell_rank"] = _oracle_cell_rank()


# --------------------------------------------------------------------------
# q_near_pairs — closest document pairs within NEAR_D_M planar meters.
# res 2 gives block width ~1.11e6 m >= the 75 km threshold; the planar
# point coordinates ride the with_planar encode (identical expression
# text on both engines), localCheckpointed before the block join
# (constraint 2: the join references px/py in block keys + distance).
# --------------------------------------------------------------------------

NEAR_D_M = 75_000.0
NEAR_RES = 2
NEAR_K = 50


def q_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions import encode_sql
    from .operators.spatial_join import near_pairs
    from .sources import synth

    docs = synth.with_lonlat(load(spark, sf_dir, "documents"), "doc_id")
    pts = (encode_sql.spark_encode(docs, "lon", "lat", NEAR_RES,
                                   with_planar=True)
           .select("doc_id", F.col("px_m").alias("px"),
                   F.col("py_m").alias("py"))
           .localCheckpoint(eager=True))
    return near_pairs(pts, NEAR_D_M, NEAR_RES, id_col="doc_id",
                      k=NEAR_K)


def _oracle_near_pairs() -> str:
    from .functions import encode_sql
    from .operators.spatial_join import near_pairs_sql
    from .sources import synth

    src = synth.duckdb_lonlat_select("documents", "doc_id", ["doc_id"])
    enc = encode_sql.duckdb_encode_select(f"({src})", "lon", "lat",
                                          NEAR_RES, ["doc_id"],
                                          with_planar=True)
    pts = f"SELECT doc_id, px_m AS px, py_m AS py FROM ({enc})"
    return near_pairs_sql(pts, NEAR_D_M, NEAR_RES, id_col="doc_id",
                          k=NEAR_K)


QUERIES23["near_pairs"] = q_near_pairs
ORACLES23["near_pairs"] = _oracle_near_pairs()


# --------------------------------------------------------------------------
# q_hll_count — deterministic HLL cardinality estimate per source, with
# the exact count-distinct yardstick + signed err_ppm next to it (the
# production caller drops the yardstick; here it IS the point: the oracle
# value-checks estimate AND error bit-for-bit).
# --------------------------------------------------------------------------


def q_hll_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketch import hll_distinct

    docs = load(spark, sf_dir, "documents")
    est = hll_distinct(docs, "source", "text")
    ex = (docs.groupBy("source")
          .agg(F.count("*").alias("n_docs"),
               F.countDistinct("text").alias("exact_distinct")))
    return (ex.join(est, "source")
            .withColumn("err_ppm", F.expr(
                "((hll_est - exact_distinct) * 1000000)"
                " div exact_distinct"))
            .select("source", "n_docs", "exact_distinct", "hll_est",
                    "err_ppm"))


def _oracle_hll_count() -> str:
    from .operators.sketch import hll_distinct_sql

    est = hll_distinct_sql("documents", "source", "text")
    return f"""
    WITH est AS MATERIALIZED ({est}),
    ex AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(count(DISTINCT text) AS BIGINT) AS exact_distinct
           FROM documents GROUP BY source)
    SELECT source, n_docs, exact_distinct, hll_est,
           CAST(((hll_est - exact_distinct) * 1000000)
                // exact_distinct AS BIGINT) AS err_ppm
    FROM ex JOIN est USING (source)
    """


QUERIES23["hll_count"] = q_hll_count
ORACLES23["hll_count"] = _oracle_hll_count()
