"""Corpus vocabulary induction: global top-V token table with coverage.

The tokenizer-training prerequisite (BPE/WordPiece pipelines start from
exactly this table): every corpus token ranked by frequency, truncated to
a vocabulary budget V, with cumulative corpus coverage per rank — the
"what V covers 99% of tokens" curve that picks the vocab size.

Scale design (100 TB):
- token counting is explode -> ONE map-side-combining hash aggregate
  (groupBy token) — the only corpus-sized shuffle, and partial aggs
  shrink it to |vocab| per map task;
- the top-V cut is orderBy(count desc, token).limit(V): Catalyst plans
  TakeOrderedAndProject — each task keeps a V-sized heap and only
  V rows per task reach the driver-side merge.  NO global sort, NO
  single-partition window over the corpus;
- rank + cumulative coverage then run over V rows (a bounded table, by
  construction), where a single-partition window is free.
Ties break lexicographically so rank and coverage are deterministic and
engine-portable.  Coverage is exact integer arithmetic (ppm floor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .dedup import tokens


def vocab_topk(df: DataFrame, text_col: str, v: int = 100) -> DataFrame:
    """(rank, tok, cnt, cum_ppm): the V most frequent tokens; cum_ppm =
    floor(1e6 * running count / total corpus tokens) in (cnt desc, tok)
    order."""
    counts = (tokens(df.select(text_col), text_col)
              .groupBy("tok").agg(F.count("*").alias("cnt")))
    # total BEFORE the cut (coverage is over the whole corpus); one extra
    # reduce-to-one-row agg, broadcast back by the literal join below
    total = counts.agg(F.sum("cnt").alias("_total"))
    top = (counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(v)
           .crossJoin(F.broadcast(total)))
    w = (Window.orderBy(F.desc("cnt"), F.asc("tok"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (top
            .withColumn("rank", F.row_number().over(
                Window.orderBy(F.desc("cnt"), F.asc("tok"))))
            .withColumn("_cum", F.sum("cnt").over(w))
            # integer `div`, not float `/`: bit-exact floor on both engines
            # (constraint-13 family — no float rounding in checked values)
            .withColumn("cum_ppm", F.expr("(_cum * 1000000) div _total"))
            .select("rank", "tok", "cnt", "cum_ppm"))


def vocab_topk_sql(table: str, text_col: str, v: int = 100) -> str:
    """DuckDB twin (shared-snippet rule).  Floor division via integer
    `//`, matching Spark's integer `div` bit-exactly."""
    return f"""
    WITH toks AS (SELECT unnest(string_split({text_col}, ' ')) AS tok
                  FROM {table}),
    counts AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
    total AS (SELECT sum(cnt) AS _total FROM counts),
    top AS (SELECT tok, cnt FROM counts
            ORDER BY cnt DESC, tok LIMIT {v})
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS INT) AS rank,
           tok,
           CAST(cnt AS BIGINT) AS cnt,
           CAST((sum(cnt) OVER (ORDER BY cnt DESC, tok
                                ROWS UNBOUNDED PRECEDING) * 1000000)
                // (SELECT _total FROM total) AS BIGINT) AS cum_ppm
    FROM top
    """


def oov_rate(df: DataFrame, text_col: str, id_col: str,
             v: int = 100) -> DataFrame:
    """Vocabulary APPLICATION, the induction's dual: per-document
    out-of-vocabulary rate against the corpus top-V vocabulary —
    (id, n_toks, n_oov, oov_ppm) with oov_ppm = floor(1e6 * n_oov /
    n_toks).  The coverage curve vocab_topk reports corpus-wide, this
    reports per document — the filter signal ("drop docs the tokenizer
    can't represent") and the shard-level QA metric.

    Scale design (100 TB): the vocabulary is V rows by construction —
    BROADCAST left join onto the token stream (no shuffle), then one
    map-side-combining per-doc hash aggregate.  Token counting reuses the
    induction's explode, so both ends of the vocab lifecycle share one
    tokenization contract."""
    vocab = (tokens(df.select(text_col), text_col)
             .groupBy("tok").agg(F.count("*").alias("cnt"))
             .orderBy(F.desc("cnt"), F.asc("tok")).limit(v)
             .select("tok", F.lit(1).alias("_iv")))
    toks = tokens(df.filter(F.col(text_col).isNotNull())
                  .select(id_col, text_col), text_col).drop(text_col)
    return (toks.join(F.broadcast(vocab), "tok", "left")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_toks"),
                 F.sum(F.when(F.col("_iv").isNull(), 1)
                       .otherwise(0)).alias("n_oov"))
            .withColumn("oov_ppm", F.expr("(n_oov * 1000000) div n_toks")))


def oov_rate_sql(table: str, text_col: str, id_col: str,
                 v: int = 100) -> str:
    """DuckDB twin (shared-snippet rule): same top-V cut (cnt desc, tok),
    same integer floor division."""
    return f"""
    WITH toks AS MATERIALIZED (
        SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS tok
        FROM {table} WHERE {text_col} IS NOT NULL),
    vocab AS MATERIALIZED (
        SELECT tok FROM (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok)
        ORDER BY cnt DESC, tok LIMIT {v}),
    marked AS (SELECT t.{id_col},
                      CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS _oov
               FROM toks t LEFT JOIN vocab v USING (tok))
    SELECT {id_col},
           CAST(count(*) AS BIGINT) AS n_toks,
           CAST(sum(_oov) AS BIGINT) AS n_oov,
           CAST((CAST(sum(_oov) AS BIGINT) * 1000000) // count(*) AS BIGINT)
               AS oov_ppm
    FROM marked GROUP BY {id_col}
    """
