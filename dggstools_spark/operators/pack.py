"""Deterministic sequence packing: assign whole documents to fixed
token-budget training bins.

The pre-training batch-construction step (public practice: T5 / TFDS
``pack_dataset``, GPT-NeoX's sample packing): concatenate documents up to
a token budget per training sequence so padding is minimized.  The exact
greedy first-fit fold is inherently sequential, so at 100 TB the standard
engineering compromise is SHARDED GREEDY packing: documents are dealt
deterministically into shards (content-keyed hash, same contract as
operators/sampling.py — membership survives repartitioning and retries),
ordered within the shard by the same hash, and cut into bins by cumulative
token count.  Each shard's cumsum is one bounded window partition, so the
whole pack is a single shuffle-by-shard + one in-partition running sum —
embarrassingly parallel across shards, no global sort, no driver fold.

Bin-assignment rule: a document lands in the bin where its cumulative
range STARTS (bin = floor((cumsum - n_tok) / budget)); a document whose
tokens straddle the boundary overflows its bin rather than splitting (the
trainer's loader does the intra-sequence split; oversized docs should be
pre-split upstream — count them via the returned n_tokens > budget bins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

#: hex digits of the md5 prefix used for shard assignment; 2 -> 256 shards
SHARD_HEX = 2


def pack_sequences(df: DataFrame, id_col: str, token_col: str,
                   budget: int, salt: str = "pack",
                   n_shard_hex: int = SHARD_HEX) -> DataFrame:
    """Assign each row a deterministic (shard, bin_id) training-sequence
    bin; bins respect ``budget`` cumulative tokens (greedy by hash order,
    start-offset rule).  Returns the input columns plus shard, bin_id.

    Determinism contract: shard and order derive from
    md5('<salt>:<id>') only — identical membership on any engine, any
    partitioning, any cluster size (same rationale as
    operators/sampling.hash_sample).
    """
    # shard id stays a hex-prefix STRING — portable across engines with
    # zero base-conversion (DuckDB's oracle compares the same substring)
    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    out = df.withColumn("_h", h) \
            .withColumn("shard", F.substring("_h", 1, n_shard_hex))
    w = Window.partitionBy("shard").orderBy("_h")
    out = out.withColumn("_cum", F.sum(token_col).over(w))
    return (out.withColumn(
        "bin_id",
        F.floor((F.col("_cum") - F.col(token_col)) / F.lit(budget))
        .cast("bigint"))
        .drop("_h", "_cum"))


def pack_stats(df: DataFrame, id_col: str, token_col: str,
               budget: int, salt: str = "pack",
               n_shard_hex: int = SHARD_HEX) -> DataFrame:
    """Per-bin packing report: (shard, bin_id, n_docs, n_tokens,
    fill_ppm) where fill_ppm = round(1e6 * n_tokens / budget) — exact
    integer arithmetic, run-stable, oracle-checkable."""
    packed = pack_sequences(df, id_col, token_col, budget, salt,
                            n_shard_hex)
    return (
        packed.groupBy("shard", "bin_id")
        .agg(F.count("*").alias("n_docs"),
             F.sum(token_col).alias("n_tokens"))
        .withColumn("fill_ppm",
                    F.round(F.col("n_tokens") * 1000000.0 / budget)
                    .cast("long"))
    )
