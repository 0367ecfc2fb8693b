"""Corpus profiling: sequence-length histogram with packing-waste curve,
snapshot diff, and tokenizer fertility — fully relational.

- ``len_histogram``: power-of-2 token-length buckets plus, for each
  candidate max_len, the padding waste a naive one-doc-per-sequence
  loader would pay — the curve that picks max_len/packing config before
  launching pack_sequences.  Bucket index is length(bin(n)) (integer bit
  length — both engines implement bin() identically), so there is no
  float log anywhere.
- ``corpus_diff``: snapshot A vs snapshot B by id + content fingerprint —
  the "what changed between crawls" report (added / removed / changed /
  unchanged counts plus per-status token mass).  One full outer join on
  id; both sides project (id, md5, n_toks) only.
- ``fertility``: per-language subword-to-word inflation ratio (BPE-ish
  regex pieces per whitespace token, exact integer ppm) — the tokenizer
  QA metric that decides per-language vocab budgets.

Determinism: everything is integer arithmetic (CLAUDE.md constraint 13);
fertility's two token counts come from the shared functions/text.py
snippets the oracle runs verbatim.

Scale design (100 TB): each profile is ONE map-side-combining hash
aggregate over a projected scan (len_histogram adds a bucket× max_len
literal cross of ~7×4 rows; corpus_diff's outer join hash-partitions on
id, the natural key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PROF_PPM = 1_000_000

#: candidate max_len values for the packing-waste curve
LEN_CANDIDATES = (64, 128, 256, 512)


def len_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """(bucket, n_docs, total_toks, waste64_ppm..waste512_ppm): docs per
    power-of-2 token-length bucket (bucket = bit length of n_toks, i.e.
    floor(log2)+1), and for each candidate max_len M the naive padding
    waste sum(M*ceil(n/M) - n) * 1e6 div sum(M*ceil(n/M)) within the
    bucket."""
    base = (df.filter(F.col(text_col).isNotNull())
            .select(F.size(F.split(F.col(text_col), " ")).alias("_n"))
            .filter(F.col("_n") > 0)
            .withColumn("bucket", F.length(F.expr("bin(_n)")).cast("int")))
    aggs = [F.count("*").alias("n_docs"),
            F.sum("_n").alias("total_toks")]
    for m in LEN_CANDIDATES:
        pad = f"sum({m} * ((_n + {m - 1}) div {m}))"
        aggs.append(F.expr(
            f"(({pad} - sum(_n)) * {PROF_PPM}) div {pad}")
            .alias(f"waste{m}_ppm"))
    return base.groupBy("bucket").agg(*aggs)


def len_histogram_sql(table: str, text_col: str) -> str:
    """DuckDB twin: same bit-length bucket, same ceil-division identity."""
    waste = []
    for m in LEN_CANDIDATES:
        pad = f"sum({m} * ((_n + {m - 1}) // {m}))"
        waste.append(f"CAST((({pad} - sum(_n)) * {PROF_PPM}) // {pad}"
                     f" AS BIGINT) AS waste{m}_ppm")
    waste_sql = ",\n           ".join(waste)
    return f"""
    WITH base AS (
        SELECT len(string_split({text_col}, ' ')) AS _n,
               CAST(length(bin(len(string_split({text_col}, ' '))))
                    AS INT) AS bucket
        FROM {table}
        WHERE {text_col} IS NOT NULL
          AND len(string_split({text_col}, ' ')) > 0)
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(_n) AS BIGINT) AS total_toks,
           {waste_sql}
    FROM base GROUP BY bucket
    """


def corpus_diff(a: DataFrame, b: DataFrame, text_col: str,
                id_col: str) -> DataFrame:
    """(status, n_docs, n_toks): added / removed / changed / unchanged
    between snapshot ``a`` (old) and ``b`` (new); n_toks counts the NEW
    side for added/changed/unchanged and the OLD side for removed.

    Contract: ``id_col`` must be unique per snapshot — duplicate ids
    fan out the outer join and double-count their statuses."""
    def proj(df: DataFrame, tag: str) -> DataFrame:
        return (df.filter(F.col(text_col).isNotNull())
                .select(F.col(id_col),
                        F.md5(F.col(text_col)).alias(f"_fp_{tag}"),
                        F.size(F.split(F.col(text_col), " "))
                        .alias(f"_nt_{tag}")))

    j = proj(a, "a").join(proj(b, "b"), id_col, "full_outer")
    status = (F.when(F.col("_fp_a").isNull(), F.lit("added"))
              .when(F.col("_fp_b").isNull(), F.lit("removed"))
              .when(F.col("_fp_a") == F.col("_fp_b"), F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    toks = F.coalesce("_nt_b", "_nt_a").cast("bigint")
    return (j.select(status.alias("status"), toks.alias("_t"))
            .groupBy("status")
            .agg(F.count("*").alias("n_docs"), F.sum("_t").alias("n_toks")))


def corpus_diff_sql(a_table: str, b_table: str, text_col: str,
                    id_col: str) -> str:
    """DuckDB twin of corpus_diff."""
    return f"""
    WITH a AS (SELECT {id_col}, md5({text_col}) AS fp_a,
                      len(string_split({text_col}, ' ')) AS nt_a
               FROM {a_table} WHERE {text_col} IS NOT NULL),
    b AS (SELECT {id_col}, md5({text_col}) AS fp_b,
                 len(string_split({text_col}, ' ')) AS nt_b
          FROM {b_table} WHERE {text_col} IS NOT NULL),
    j AS (SELECT CASE WHEN fp_a IS NULL THEN 'added'
                      WHEN fp_b IS NULL THEN 'removed'
                      WHEN fp_a = fp_b THEN 'unchanged'
                      ELSE 'changed' END AS status,
                 coalesce(nt_b, nt_a) AS _t
          FROM a FULL OUTER JOIN b USING ({id_col}))
    SELECT status,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(_t) AS BIGINT) AS n_toks
    FROM j GROUP BY status
    """


def fertility(df: DataFrame, text_col: str, group_col: str) -> DataFrame:
    """(group, n_docs, n_words, n_pieces, fertility_ppm): BPE-ish subword
    pieces per whitespace word, exact integer ppm per group."""
    from ..functions import text as T

    base = (df.filter(F.col(text_col).isNotNull())
            .select(F.col(group_col),
                    F.expr(T.token_count(text_col)).alias("_w"),
                    F.expr(T.token_count_bpe_spark(text_col)).alias("_p")))
    return (base.groupBy(group_col)
            .agg(F.count("*").alias("n_docs"),
                 F.sum("_w").cast("bigint").alias("n_words"),
                 F.sum("_p").cast("bigint").alias("n_pieces"))
            .withColumn("fertility_ppm", F.expr(
                f"(n_pieces * {PROF_PPM}) div greatest(n_words, 1)")))


def fertility_sql(table: str, text_col: str, group_col: str) -> str:
    """DuckDB twin of fertility (shared token-count snippets)."""
    from ..functions import text as T

    return f"""
    WITH base AS (
        SELECT {group_col},
               {T.token_count(text_col)} AS _w,
               {T.token_count_bpe_duckdb(text_col)} AS _p
        FROM {table} WHERE {text_col} IS NOT NULL)
    SELECT {group_col},
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(_w) AS BIGINT) AS n_words,
           CAST(sum(_p) AS BIGINT) AS n_pieces,
           CAST((CAST(sum(_p) AS BIGINT) * {PROF_PPM})
                // greatest(CAST(sum(_w) AS BIGINT), 1) AS BIGINT)
               AS fertility_ppm
    FROM base GROUP BY {group_col}
    """
