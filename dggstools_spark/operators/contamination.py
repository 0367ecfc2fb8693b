"""Benchmark decontamination: flag training documents whose token n-grams
collide with a benchmark/eval corpus.

Standard LLM training-data hygiene (the n-gram overlap check popularized by
the GPT-3 appendix-C / PaLM / Llama decontamination procedures, all public):
any document sharing >= ``min_hits`` distinct word n-grams with the
benchmark set is flagged so it can be dropped or quarantined before
training.  No counterpart in the reference engine (dggstools is a DGGS
toolbox); this lives in the LLM-pipeline layer next to operators/dedup.py.

Scale design (100 TB corpus, ~10^4-10^6 benchmark docs):

- The benchmark n-gram set is TINY relative to the corpus (benchmarks are
  human-curated suites).  It is distinct-ed and **broadcast**, so the
  corpus-side scan never shuffles for the membership probe — the only
  shuffles are the per-doc distinct + the final doc_id aggregations, all
  keyed on doc_id and map-side combinable.
- Corpus-side n-grams reuse operators.dedup.shingles (explode + slice —
  whole-stage codegen, no Python).  The distinct before the probe keeps
  "n contaminated grams" = distinct-gram semantics and bounds the join
  output by the doc's vocabulary, not its length.
- Output is one row per input document (clean docs carry n_hits = 0), so
  the result can be joined back as a filter predicate without re-scanning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingles


def benchmark_ngrams(bench: DataFrame, text_col: str, n: int = 5) -> DataFrame:
    """Distinct word n-grams of the benchmark corpus — the broadcast probe
    side.  Kept separate so callers can persist/reuse it across corpus
    shards (the benchmark set is fixed while the corpus streams)."""
    return (
        shingles(bench.select(text_col), text_col, n, out="gram")
        .select("gram").distinct()
    )


def decontaminate(df: DataFrame, bench: DataFrame, text_col: str,
                  id_col: str, n: int = 5, min_hits: int = 1,
                  bench_text_col: str | None = None) -> DataFrame:
    """Per-document contamination report against a benchmark corpus.

    Returns one row per document: (id_col, n_grams, n_hits, contam_ppm,
    flagged) where n_grams counts the doc's distinct word n-grams, n_hits
    those also present anywhere in the benchmark set, contam_ppm =
    round(1e6 * n_hits / n_grams) (exact integer arithmetic — run-stable,
    CLAUDE.md constraint 13 family), and flagged = 1 iff
    n_hits >= min_hits.

    Short-doc rule: a document shorter than ``n`` tokens contributes its
    whole text as a single truncated gram (same slice convention as every
    shingle consumer in this package, see dedup.shingles).
    """
    bench_grams = benchmark_ngrams(bench, bench_text_col or text_col, n) \
        .withColumn("_hit", F.lit(1))
    sh = (
        shingles(df.select(id_col, text_col), text_col, n, out="gram")
        .select(id_col, "gram").distinct()
    )
    # single consumer pipeline: broadcast LEFT join marks hits, one agg
    # computes both totals — one corpus scan, one distinct shuffle, one
    # id-keyed agg (vs the naive sizes-join-hits shape, which re-derives
    # the scan+explode+distinct per consumer: no ReuseExchange, the
    # subplans differ textually)
    return (
        sh.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_grams"),
             F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hits"))
        .withColumn(
            "contam_ppm",
            F.round(F.col("n_hits") * 1000000.0 / F.col("n_grams"))
            .cast("long"))
        .withColumn(
            "flagged",
            (F.col("n_hits") >= F.lit(min_hits)).cast("int"))
    )
