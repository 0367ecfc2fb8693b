"""SemDeDup-style semantic deduplication over an embedding column.

The embedding-space dedup stage of modern corpus pipelines (Abbas et al.
2023, "SemDeDup": cluster embeddings with k-means, then drop documents
whose within-cluster cosine similarity to another document exceeds a
threshold, keeping one representative per semantic near-dup group).

Relational realization (all built-ins, no UDFs):

1. deterministic residue centroids (similarity.ivf_centroids — the same
   training-free seeding the IVF family uses, so the whole construction
   stays SQL-expressible and oracle-checkable);
2. nearest-centroid assignment (similarity.ivf_assign — broadcast
   centroids, HOF dot in the BNLJ stage per CLAUDE.md constraint 15,
   WindowGroupLimit top-1);
3. within-cluster pair similarities: ONE equi-join on the cluster id
   (a_id < b_id), flat known-dim dot (equi-join rerank shape — codegen);
4. the keep rule: a document is DROPPED iff some smaller-id document in
   its cluster sits at cosine >= threshold (deterministic, one semi-join;
   the min-id representative of every near-dup group always survives);
5. per-cluster report: (cid, n_docs, n_dropped, kept_id_sum) — the sum of
   surviving ids is an order-insensitive exact integer, so the oracle
   value-checks the exact KEEP SET per cluster without a single-task
   sorted reduction (same design as dedup_pipeline's kept_hash).

Scale design (100 TB): centroids are a broadcast table; the quadratic
within-cluster pair stage is the SemDeDup semantic itself — cluster
granularity (``mod``) bounds expected cluster size, and the pair join is
an equi-join that AQE handles per-cluster-skew; similarity comparisons
use round(.,9) on irrational cosine ratios (engine-portable, CLAUDE.md
constraint 17 does not apply).  Thresholding happens ON the rounded
value so both engines compare identical doubles.

Reference parity: no counterpart (the reference has no embedding layer);
extends the F5 dedup family alongside dedup.embedding_near_dup_pairs,
which finds pairs via hyperplane LSH — this operator is the
cluster-then-prune alternative with a per-cluster keep decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .similarity import DOT_SPARK, ivf_assign, ivf_centroids

#: similarity decimals — rounds an irrational cosine ratio (safe to
#: compare across engines; see module docstring)
SIM_DECIMALS = 9


def semantic_dedup(emb: DataFrame, threshold: float,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   mod: int = 23, residue: int = 3,
                   dim: int | None = None) -> DataFrame:
    """(cid, n_docs, n_dropped, kept_id_sum) per cluster — see module
    docstring for the drop rule and the kept-set audit column."""
    from .similarity import dot_spark

    cents = ivf_centroids(emb, vec_col, id_col, mod, residue)
    assign = ivf_assign(emb, cents, vec_col, id_col, keep_norm="_n") \
        .localCheckpoint(eager=True)  # feeds pairs (twice) + the report
    a = assign.select(F.col(id_col).alias("a_id"),
                      F.col(vec_col).alias("a_emb"),
                      F.col("_n").alias("_na"), "cid")
    b = assign.select(F.col(id_col).alias("b_id"),
                      F.col(vec_col).alias("b_emb"),
                      F.col("_n").alias("_nb"), "cid")
    dot = (dot_spark("a_emb", "b_emb", dim) if dim
           else DOT_SPARK.format(a="a_emb", b="b_emb"))
    dropped = (a.join(b, "cid")
               .filter(F.col("a_id") < F.col("b_id"))
               .withColumn("_s", F.expr(
                   f"round(({dot}) / (_na * _nb), {SIM_DECIMALS})"))
               .filter(F.col("_s") >= threshold)
               .select("cid", F.col("b_id").alias("doc"))
               .distinct())
    per_doc = (assign.select("cid", F.col(id_col).alias("doc"))
               .join(dropped.withColumn("_dropped", F.lit(1)),
                     ["cid", "doc"], "left"))
    return (per_doc.groupBy("cid")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.coalesce("_dropped", F.lit(0))).alias("n_dropped"),
                 F.sum(F.when(F.col("_dropped").isNull(), F.col("doc"))
                       .otherwise(F.lit(0))).alias("kept_id_sum")))


def semantic_dedup_sql(emb_table: str, threshold: float,
                       mod: int = 23, residue: int = 3,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> str:
    """DuckDB twin (shared construction with the ivf_topk oracle family:
    residue centroids, top-1 assignment window, round(.,9) sims)."""
    from .similarity import DOT_DUCK, NRM_DUCK

    def sim(x, y):
        return (f"round(({DOT_DUCK.format(a=x, b=y)})"
                f" / ({NRM_DUCK.format(v=x)} * {NRM_DUCK.format(v=y)}),"
                f" {SIM_DECIMALS})")

    return f"""
    WITH cents AS MATERIALIZED (
        SELECT {id_col} AS cid, {vec_col} AS cvec FROM {emb_table}
        WHERE {id_col} % {mod} = {residue}),
    asim AS (SELECT e.{id_col}, e.{vec_col}, c.cid,
                    {sim(f'e.{vec_col}', 'c.cvec')} AS s
             FROM {emb_table} e, cents c),
    assign AS MATERIALIZED (
        SELECT {id_col}, {vec_col}, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY {id_col}
                ORDER BY s DESC, cid) AS rn FROM asim) WHERE rn = 1),
    dropped AS MATERIALIZED (
        SELECT DISTINCT a.cid, b.{id_col} AS doc
        FROM assign a JOIN assign b USING (cid)
        WHERE a.{id_col} < b.{id_col}
          AND {sim(f'a.{vec_col}', f'b.{vec_col}')} >= {threshold})
    SELECT a.cid,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(d.doc) AS BIGINT) AS n_dropped,
           CAST(sum(CASE WHEN d.doc IS NULL THEN a.{id_col} ELSE 0 END)
                AS BIGINT) AS kept_id_sum
    FROM assign a
    LEFT JOIN dropped d ON d.cid = a.cid AND d.doc = a.{id_col}
    GROUP BY a.cid
    """
