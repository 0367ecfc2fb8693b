"""Driver-contract queries, batch 30 (round 6): IVF+PQ composed ANN.

- ``ann_ivfpq``: the fourth ANN family — faiss-IndexIVFPQ shape
  (non-residual): IVF inverted-list pruning + PQ/ADC ranking of probed
  lists only.  pq_topk's whole-corpus ADC scan becomes one hash
  equi-join on the list id; the 100-TB ANN architecture (TODO_r7 #4
  family).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .queries3 import load

QUERIES27: "dict[str, Callable[[SparkSession, str], DataFrame]]" = {}
ORACLES27: "dict[str, str]" = {}

IVFPQ_K = 3
IVFPQ_MOD = 23
IVFPQ_RES = 3
IVFPQ_NPROBE = 3
_IVFPQ_Q_PRED = "vec_id % 50 = 0"


def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.pq import ivfpq_topk

    emb = load(spark, sf_dir, "embeddings")
    qs = emb.filter(F.expr(_IVFPQ_Q_PRED)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    return ivfpq_topk(emb, qs, IVFPQ_K, mod=IVFPQ_MOD, residue=IVFPQ_RES,
                      nprobe=IVFPQ_NPROBE)


def _oracle_ann_ivfpq() -> str:
    from .operators.pq import ivfpq_topk_sql

    return ivfpq_topk_sql("embeddings", IVFPQ_K, _IVFPQ_Q_PRED,
                          mod=IVFPQ_MOD, residue=IVFPQ_RES,
                          nprobe=IVFPQ_NPROBE)


QUERIES27["ann_ivfpq"] = q_ann_ivfpq
ORACLES27["ann_ivfpq"] = _oracle_ann_ivfpq()
