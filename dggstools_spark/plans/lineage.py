"""Per-partition lineage + checkpointed, resumable batch writes (north rule:
"per-partition lineage rows and checkpointed resumability so any failed tile
batch replays deterministically").

Storage layout (plain parquet here; Iceberg tables on a real cluster):

    <root>/data/batch_key=<k>/...   cell rows, partitioned by batch key
    <root>/_lineage/                (batch_key, partition_id, n_rows,
                                     checksum, written_at)
    <root>/_batches/                (batch_key, n_rows, status)

``checkpointed_write`` is idempotent per batch key: completed batches are
skipped on replay, half-written batches are overwritten (dynamic partition
overwrite), so a failed run re-executed from the top converges to the same
table state deterministically."""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def with_lineage(df: DataFrame, batch_key: str) -> DataFrame:
    """Tag rows with their physical partition id (for the lineage agg)."""
    return df.withColumn("_pid", F.spark_partition_id()) \
             .withColumn("batch_key", F.lit(batch_key))


def lineage_rows(df: DataFrame, batch_key: str, key_cols: list[str]) -> DataFrame:
    """(batch_key, partition_id, n_rows, checksum) per physical partition —
    an order-insensitive xor/sum checksum over the key columns, cheap enough
    to run inline with the write."""
    tagged = with_lineage(df, batch_key)
    # xor-fold: order-insensitive and overflow-free (ANSI mode forbids a
    # plain sum of 64-bit hashes)
    return tagged.groupBy("batch_key", "_pid").agg(
        F.count("*").alias("n_rows"),
        F.expr(f"bit_xor(xxhash64({', '.join(key_cols)}))").alias("checksum"),
    ).withColumnRenamed("_pid", "partition_id") \
     .withColumn("written_at", F.lit(int(time.time())))


def completed_batches(spark: SparkSession, root: str) -> set[str]:
    try:
        df = spark.read.parquet(f"{root}/_batches")
    except Exception:
        return set()
    return {r.batch_key for r in
            df.filter(F.col("status") == "done").select("batch_key").distinct().collect()}


def checkpointed_write(df: DataFrame, root: str, batch_key: str,
                       key_cols: list[str]) -> bool:
    """Idempotently write one batch; returns False if already complete.

    Order per batch: data (partition overwrite) -> lineage -> commit marker.
    A crash before the marker leaves the batch uncommitted; the replay
    overwrites the same partition and re-appends lineage (lineage rows carry
    written_at, so replays are auditable)."""
    spark = df.sparkSession
    if batch_key in completed_batches(spark, root):
        return False
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    tagged = df.withColumn("batch_key", F.lit(batch_key))
    tagged.write.mode("overwrite").partitionBy("batch_key").parquet(f"{root}/data")
    lineage_rows(df, batch_key, key_cols).write.mode("append").parquet(f"{root}/_lineage")
    n = df.count()
    spark.createDataFrame([(batch_key, n, "done")],
                          "batch_key string, n_rows long, status string") \
        .write.mode("append").parquet(f"{root}/_batches")
    return True


def run_batches(df: DataFrame, root: str, batch_col: str,
                key_cols: list[str]) -> dict[str, bool]:
    """Partition a DataFrame into batches by ``batch_col`` (e.g. the cell
    prefix) and checkpoint-write each; resumable from any point."""
    keys = [r[0] for r in df.select(batch_col).distinct().collect()]
    results = {}
    for k in sorted(keys):
        part = df.filter(F.col(batch_col) == k)
        results[k] = checkpointed_write(part, root, str(k), key_cols)
    return results
