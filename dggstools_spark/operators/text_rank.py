"""BM25 document ranking — fully relational, oracle-checkable.

The missing piece between the engine's token statistics (functions/text.py)
and its similarity search: lexical relevance ranking of a corpus against a
query term set, the retrieval half of a RAG / training-data curation
pipeline.  Okapi BM25:

    score(d, q) = sum_{t in q} idf(t) * tf(t,d) * (k1 + 1)
                  / (tf(t,d) + k1 * (1 - b + b * |d| / avgdl))
    idf(t)      = ln( (N - df(t) + 0.5) / (df(t) + 0.5) + 1 )

Plan shape at scale (one token explode, two hash aggs, broadcast joins):

    docs -> explode(tokens) -> filter terms in q     (query terms pruned
                                                      BEFORE the agg: the
                                                      shuffle carries only
                                                      query-term hits)
         -> tf per (doc, term)         [hash agg, map-side combine]
    corpus stats (N, avgdl) and per-term df are query-term-sized frames ->
    broadcast-joined back; per-(doc,term) partial scores -> per-doc sum ->
    rank window (WindowGroupLimit pushdown for top-k).

Run-stability: the per-doc score is a SUM OF FLOATS whose partial-agg
order Spark does not fix (CLAUDE.md constraint 13), so per-(doc,term)
scores are quantized to integers (round(score * 2^20) as BIGINT) BEFORE
the sum — associative, bit-stable on any partitioning, and the DuckDB
oracle reproduces it exactly (2^20 multiply is exact; both engines round
the same doubles).  ln/division inputs are identical doubles on both
engines (libm parity, proven by the oracle gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

K1 = 1.2
B = 0.75
#: quantization scale for the per-(doc,term) score (constraint 13)
Q_SHIFT = 20


def bm25_scores(df: DataFrame, text_col: str, id_col: str,
                terms: "list[str]") -> DataFrame:
    """Per-document quantized BM25 score against ``terms``:
    (id_col, score_q20) with score_q20 = sum_t round(score_t * 2^20).
    Documents matching no term are absent.  Tokenization is the engine's
    standard whitespace split on lower-cased text (functions/text.py
    convention), so tf/df match token_stats counts."""
    if not terms:
        raise ValueError("terms must be non-empty")
    terms = sorted({t.lower() for t in terms})

    toks = df.select(
        id_col,
        F.size(F.split(F.lower(F.col(text_col)), " ")).alias("_dl"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("_t"),
    )
    hits = toks.filter(F.col("_t").isin(terms))
    tf = hits.groupBy(id_col, "_t").agg(
        F.count("*").alias("_tf"), F.first("_dl").alias("_dl"))

    # corpus stats: N and avgdl over ALL docs (not only matching ones) —
    # two scalars, computed in one tiny agg and cross-joined (broadcast).
    # avgdl is carried as an exact BIGINT length sum, not avg(): float
    # avg's partial-agg order is not run-stable (constraint 13); integer
    # sums are associative, and _sumdl/_n divides the same exact values on
    # both engines
    stats = df.select(
        F.count("*").alias("_n"),
        F.sum(F.size(F.split(F.lower(F.col(text_col)), " "))
              .cast("bigint")).alias("_sumdl"))
    # per-term document frequency over matching docs
    dfreq = hits.select(id_col, "_t").distinct() \
        .groupBy("_t").agg(F.count("*").alias("_df"))

    idf = "ln(((_n - _df + 0.5) / (_df + 0.5)) + 1.0)"
    avgdl = "(CAST(_sumdl AS DOUBLE) / _n)"
    score = (f"{idf} * _tf * ({K1} + 1.0)"
             f" / (_tf + {K1} * (1.0 - {B} + {B} * _dl / {avgdl}))")
    per_term = (tf.join(F.broadcast(dfreq), "_t")
                .join(F.broadcast(stats))
                .withColumn("_s", F.round(F.expr(score) * (1 << Q_SHIFT))
                            .cast("bigint")))
    return per_term.groupBy(id_col).agg(F.sum("_s").alias("score_q20"))


def bm25_topk(df: DataFrame, text_col: str, id_col: str,
              terms: "list[str]", k: int) -> DataFrame:
    """Top-k BM25 documents: (id_col, score_q20, rank), ties broken by
    ``id_col`` so the cut is total-ordered and engine-portable.  The rank
    window is a single global top-k — Spark >= 3.5 plans a partial
    WindowGroupLimit, so map tasks forward k rows each, not the corpus
    (CLAUDE.md constraint 9)."""
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("score_q20").desc(), F.col(id_col))
    return (bm25_scores(df, text_col, id_col, terms)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def bm25_oracle_sql(table: str, text_col: str, id_col: str,
                    terms: "list[str]", k: int) -> str:
    """DuckDB twin of bm25_topk (shared-snippet rule) — parameterized so
    composite queries (hybrid_rerank) reuse the identical recall stage."""
    terms_sql = ", ".join(f"'{t}'" for t in sorted({t.lower() for t in terms}))
    idf = "ln(((_n - _df + 0.5) / (_df + 0.5)) + 1.0)"
    avgdl = "(CAST(_sumdl AS DOUBLE) / _n)"
    score = (f"{idf} * _tf * ({K1} + 1.0)"
             f" / (_tf + {K1} * (1.0 - {B} + {B} * _dl / {avgdl}))")
    return f"""
    WITH toks AS (
      SELECT {id_col}, len(string_split(lower({text_col}), ' ')) AS _dl,
             unnest(string_split(lower({text_col}), ' ')) AS _t
      FROM {table}),
    hits AS (SELECT * FROM toks WHERE _t IN ({terms_sql})),
    tf AS (SELECT {id_col}, _t, count(*) AS _tf, min(_dl) AS _dl
           FROM hits GROUP BY {id_col}, _t),
    stats AS (SELECT count(*) AS _n,
                     CAST(sum(len(string_split(lower({text_col}), ' ')))
                          AS BIGINT) AS _sumdl
              FROM {table}),
    dfreq AS (SELECT _t, count(DISTINCT {id_col}) AS _df
              FROM hits GROUP BY _t),
    per_term AS (
      SELECT tf.{id_col},
             CAST(round(({score}) * {1 << Q_SHIFT}) AS BIGINT) AS _s
      FROM tf JOIN dfreq USING (_t) CROSS JOIN stats),
    scores AS (SELECT {id_col}, CAST(sum(_s) AS BIGINT) AS score_q20
               FROM per_term GROUP BY {id_col})
    SELECT {id_col}, score_q20, rank FROM (
      SELECT {id_col}, score_q20,
             row_number() OVER (ORDER BY score_q20 DESC, {id_col}) AS rank
      FROM scores)
    WHERE rank <= {k}
    """
