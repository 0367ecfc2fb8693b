"""SparkSession factory with the engine's scale-oriented defaults.

Single place where shuffle/AQE/Arrow policy lives so every entry point
(driver contract, bench, tests) runs the same way.  Designed for a real
multi-executor cluster (spark-submit --py-files dggstools_spark.zip); in this
sandbox it runs local[N]."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "dggstools-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # every hot Python path is Arrow-batched (north rule: no per-row Python)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # AQE: runtime coalescing + skew-join splitting for dense-tile skew
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # naive parquet timestamps are interpreted as UTC, matching DuckDB
        .config("spark.sql.session.timeZone", "UTC")
        # Align Spark's whole-stage-codegen size cutoff with HotSpot's JIT
        # limit (-XX:HugeMethodLimit=8000 bytecode): a generated stage
        # method in (8000, 65535] bytes compiles under janino but HotSpot
        # REFUSES to JIT it, so the stage runs in the bytecode interpreter
        # — silently, with no CompileException for the strict-codegen guard
        # to catch.  Measured on embed_pairs.count() at sf1 (the flat cos
        # fold lands in the BroadcastHashJoin condition; adding the count's
        # HashAggregate to that stage pushed the method past 8000 bytes):
        # 185-191 s at the 65535 default vs 24-26 s with 8000, fully
        # reversible by flipping the conf back (CLAUDE.md constraint 16).
        # With 8000, Spark skips whole-stage codegen for exactly those
        # stages and runs the volcano operators, each of which stays
        # JIT-compiled.
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        # keep parquet scans chunky enough for local[32]; on a cluster this is
        # left to spark.sql.files.maxPartitionBytes default (128m)
        # local mode: the driver JVM hosts all executor threads — size the
        # heap for cpus concurrent hash-agg/shuffle tasks (measured: 8g
        # chokes local[32] into GC at ~16M-row aggregations)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
