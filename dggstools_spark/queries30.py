"""Driver-contract queries, batch 34 (round 6): BPE tokenizer training.

- ``bpe_merges``: the learned merge table — BPE_ROUNDS rounds of
  most-frequent-adjacent-pair induction over the documents corpus
  (operators/bpe.py; Sennrich 2016 semantics, vocabulary-sized state,
  one corpus pass).
- ``bpe_stats``: the corpus-level payoff of those merges — words, total
  occurrences, initial symbol count (chars + '</w>'), final token count
  under the learned merges, and the exact compression ratio in ppm.

Both are ALL-INTEGER/string outputs (hash-exact); the oracle unrolls the
identical rounds as MATERIALIZED CTEs.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .queries3 import load

QUERIES30: "dict[str, Callable[[SparkSession, str], DataFrame]]" = {}
ORACLES30: "dict[str, str]" = {}

BPE_ROUNDS = 6


def _bpe(spark: SparkSession, sf_dir: str):
    from .operators.bpe import bpe_train

    return bpe_train(load(spark, sf_dir, "documents"), "text",
                     BPE_ROUNDS)


def _bpe_sql_with() -> str:
    from .operators.bpe import bpe_ctes, word_table_sql

    return bpe_ctes(word_table_sql("documents", "text"), BPE_ROUNDS)


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = _bpe(spark, sf_dir)
    return merges


def _oracle_bpe_merges() -> str:
    return (f"WITH {_bpe_sql_with()}\n"
            f'SELECT round, "left", "right", pair_count FROM mrg')


QUERIES30["bpe_merges"] = q_bpe_merges
ORACLES30["bpe_merges"] = _oracle_bpe_merges()


def q_bpe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, seq = _bpe(spark, sf_dir)
    words = seq.select("word", "freq").distinct()
    init = words.agg(
        F.count("*").alias("n_words"),
        F.sum("freq").alias("total_freq"),
        F.sum(F.expr("freq * (char_length(word) + 1)")).alias(
            "init_syms"))
    fin = seq.agg(F.sum("freq").alias("final_tokens"))
    return (init.crossJoin(F.broadcast(fin))
            .select(F.col("n_words").cast("bigint").alias("n_words"),
                    F.col("total_freq").cast("bigint").alias(
                        "total_freq"),
                    F.col("init_syms").cast("bigint").alias("init_syms"),
                    F.col("final_tokens").cast("bigint").alias(
                        "final_tokens"),
                    F.expr("(final_tokens * 1000000) div init_syms")
                    .cast("bigint").alias("compression_ppm")))


def _oracle_bpe_stats() -> str:
    return f"""
    WITH {_bpe_sql_with()},
    _init AS (
        SELECT CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(freq) AS BIGINT) AS total_freq,
               CAST(sum(freq * (length(word) + 1)) AS BIGINT)
                   AS init_syms
        FROM _w),
    _fin AS (SELECT CAST(sum(freq) AS BIGINT) AS final_tokens
             FROM seq{BPE_ROUNDS})
    SELECT n_words, total_freq, init_syms, final_tokens,
           CAST((final_tokens * 1000000) // init_syms AS BIGINT)
               AS compression_ppm
    FROM _init CROSS JOIN _fin
    """


QUERIES30["bpe_stats"] = q_bpe_stats
ORACLES30["bpe_stats"] = _oracle_bpe_stats()
