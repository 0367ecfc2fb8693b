"""Hybrid retrieval: BM25 recall stage + embedding-cosine rerank.

The canonical two-stage retrieval pipeline (every production RAG /
curation stack): a cheap lexical recall stage pulls the top-N candidates
from the corpus (text_rank.bm25_topk — one token explode, query-term
pruned shuffle, WindowGroupLimit cut), then a dense rerank stage orders
those N by cosine similarity to a query embedding.  The expensive vector
math runs on N rows, never the corpus.

Plan shape at scale:
- recall: bm25_topk's plan (corpus-sized, but the shuffle carries only
  query-term hits);
- rerank: the N-row candidate frame equi-joins the embedding table on id
  (N is tiny → AQE broadcasts the candidates into the embedding scan, so
  the join is a semi-join-shaped probe of the big side), then a 1-row
  broadcast of the query vector.  Per CLAUDE.md constraint 15 this is a
  RERANK shape: the lone FLAT left-associated dot (similarity.dot_spark,
  dim pinned) compiles into whole-stage codegen; norms ride the same
  N-row stage (post-recall row counts make codegen budget irrelevant, and
  the hugeMethodLimit=8000 guard in session.py covers the worst case).
- final cut: rank window over N rows.

Determinism: BM25 scores are quantized-integer sums (text_rank, constraint
13); the cosine is the flat fold both engines evaluate in identical order,
rounded to 9 dp like every ANN query.  Fully oracle-checked end to end.

Reference parity: no retrieval in the reference engine; LLM-pipeline
extension batch (SURVEY.md §2 extension), composing text_rank + similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .similarity import dot_spark, nrm_spark
from .text_rank import bm25_topk


def hybrid_rerank(docs: DataFrame, emb: DataFrame, terms: "list[str]",
                  query_vec: DataFrame, n_recall: int, k: int,
                  text_col: str = "text", id_col: str = "doc_id",
                  vec_col: str = "embedding", vec_id: str = "vec_id",
                  q_vec: str = "q_vec",
                  dim: int | None = None) -> DataFrame:
    """(id, score_q20, cos, rank): BM25 top-``n_recall`` candidates
    reranked by cosine against the single-row ``query_vec`` frame's
    ``q_vec`` column; top-``k`` by (cos desc, id)."""
    from pyspark.sql.window import Window

    cands = bm25_topk(docs, text_col, id_col, terms, n_recall) \
        .select(id_col, "score_q20")
    e = emb.select(F.col(vec_id).alias(id_col), vec_col)
    q = query_vec.select(q_vec)
    # the rerank stage's generated method is ~16.8 KB (codegen audit) —
    # past the 8 KB JIT cliff, so under the session's hugeMethodLimit it
    # runs as volcano operators.  On an N-row post-recall frame that is
    # irrelevant, and the constraint-15 norms-pre-join split was MEASURED
    # and rejected here: CollapseProject re-merges the norm projections
    # into the join stage and grows the method to 28.6 KB (same re-merge
    # the embed_pairs split-signature study hit, TODO_r4 #4).
    dot = dot_spark(vec_col, q_vec, dim)
    cos = (f"round(({dot}) / (({nrm_spark(vec_col, dim)})"
           f" * ({nrm_spark(q_vec, dim)})), 9)")
    w = Window.orderBy(F.desc("cos"), F.asc(id_col))
    return (cands.join(e, id_col)
            .crossJoin(F.broadcast(q))
            .withColumn("cos", F.expr(cos))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(id_col, "score_q20", "cos", "rank"))


def hybrid_rerank_sql(table: str, emb_table: str, terms: "list[str]",
                      query_vec_pred: str, n_recall: int, k: int,
                      text_col: str = "text", id_col: str = "doc_id",
                      vec_col: str = "embedding",
                      vec_id: str = "vec_id") -> str:
    """DuckDB twin: the shared bm25 recall CTE + the established
    DOT_DUCK/NRM_DUCK fold pair; ``query_vec_pred`` selects the single
    query-vector row from ``emb_table``."""
    from .similarity import DOT_DUCK, NRM_DUCK
    from .text_rank import bm25_oracle_sql

    recall = bm25_oracle_sql(table, text_col, id_col, terms, n_recall)
    dot = DOT_DUCK.format(a=vec_col, b="q_vec")
    cos = (f"round(({dot}) / (({NRM_DUCK.format(v=vec_col)})"
           f" * ({NRM_DUCK.format(v='q_vec')})), 9)")
    return f"""
    WITH cand AS MATERIALIZED ({recall}),
    e AS (SELECT {vec_id} AS {id_col}, {vec_col} FROM {emb_table}),
    q AS (SELECT {vec_col} AS q_vec FROM {emb_table}
          WHERE {query_vec_pred}),
    sc AS (SELECT c.{id_col}, c.score_q20, {cos} AS cos
           FROM cand c JOIN e USING ({id_col}), q)
    SELECT {id_col}, score_q20, cos, CAST(rank AS INT) AS rank FROM (
        SELECT *, row_number() OVER (ORDER BY cos DESC, {id_col}) AS rank
        FROM sc)
    WHERE rank <= {k}
    """
