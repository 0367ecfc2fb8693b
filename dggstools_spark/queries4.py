"""Driver-contract queries, batch 4: the last pytest-only operators
converted to oracle-checked rows — tile-array assembly (S7/S8), grid
generation (R7), the A10 optimality check, and Structured-Streaming ingest
(complete-mode memory sink + availableNow = a deterministic, oracle-able
streaming run)."""

from __future__ import annotations

import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dggs.config import DEFAULT_CONFIG
from .functions import encode_sql
from .queries3 import _docs_cells, _oracle_docs_cells, load


# --------------------------------------------------------------------------
# q_tile_arrays — S7/S8: per-tile dense 2-D array assembly (grouped-map);
# verified via shape + non-nodata mass per tile
# --------------------------------------------------------------------------

TA_RES = 4
TA_PREFIX = 2


def q_tile_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.raster import assemble_tile_arrays, cells_to_tiles

    enc = _docs_cells(spark, sf_dir, TA_RES, keep=["doc_id"])
    cells = enc.groupBy("cellid").agg(F.count("*").cast("double").alias("band1"))
    rows = cells_to_tiles(cells, value_cols=["band1"], tile_prefix_len=TA_PREFIX,
                          res=TA_RES)
    tiles = assemble_tile_arrays(rows, TA_RES, value_col="band1")
    # nodata slots surface as NULL (Arrow turns NaN inside nested lists into
    # null on the pandas->Arrow hop) or NaN — treat both as empty
    empty = "(v IS NULL OR isnan(v))"
    return tiles.select(
        "tile", "height", "width",
        F.expr(f"aggregate(flatten(data), 0.0D,"
               f" (a, v) -> a + (CASE WHEN {empty} THEN 0.0 ELSE v END))")
        .cast("bigint").alias("sum_v"),
        F.expr(f"aggregate(flatten(data), 0L,"
               f" (a, v) -> a + (CASE WHEN {empty} THEN 0 ELSE 1 END))")
        .cast("bigint").alias("n_filled"),
    )


def _oracle_tile_arrays() -> str:
    enc = _oracle_docs_cells(TA_RES, [])
    side = DEFAULT_CONFIG.n_side ** (TA_RES - (TA_PREFIX - 1))
    return f"""
    WITH cells AS (SELECT cellid, count(*) AS n FROM ({enc}) GROUP BY cellid)
    SELECT substring(cellid, 1, {TA_PREFIX}) AS tile,
           CAST({side} AS INT) AS height, CAST({side} AS INT) AS width,
           CAST(sum(n) AS BIGINT) AS sum_v,
           count(*) AS n_filled
    FROM cells GROUP BY 1
    """


# --------------------------------------------------------------------------
# q_grid — R7: distributed whole-face grid generation with planar centroids
# --------------------------------------------------------------------------

GRID_RES = 2
GRID_FACES = "NQ"


def q_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.raster import grid

    g = grid(spark, GRID_RES, faces=GRID_FACES)
    return g.agg(
        F.count("*").alias("n_cells"),
        F.min("cellid").alias("min_cell"),
        F.max("cellid").alias("max_cell"),
        F.round(F.sum("x")).cast("bigint").alias("sum_x_m"),
        F.round(F.sum("y")).cast("bigint").alias("sum_y_m"),
    )


def _oracle_grid() -> str:
    from .dggs.cells import HALF_SIDE, _face_ul

    n_cells = DEFAULT_CONFIG.n_side**GRID_RES
    w = float(HALF_SIDE / n_cells)
    uls = _face_ul(DEFAULT_CONFIG)
    face_idx = {"N": 0, "O": 1, "P": 2, "Q": 3, "R": 4, "S": 5}
    blocks = []
    for f in GRID_FACES:
        cellid = encode_sql.rowcol_cellid_sql(f"'{f}'", "row", "col", GRID_RES)
        ulx = float(uls[face_idx[f], 0])
        uly = float(uls[face_idx[f], 1])
        blocks.append(f"""
        SELECT {cellid} AS cellid,
               CAST({ulx!r} AS DOUBLE) + (col + 0.5) * CAST({w!r} AS DOUBLE) AS x,
               CAST({uly!r} AS DOUBLE) - (row + 0.5) * CAST({w!r} AS DOUBLE) AS y
        FROM (SELECT CAST(i // {n_cells} AS BIGINT) AS row,
                     CAST(i % {n_cells} AS BIGINT) AS col
              FROM range({n_cells * n_cells}) t(i))""")
    union = " UNION ALL ".join(blocks)
    return f"""
    SELECT count(*) AS n_cells, min(cellid) AS min_cell, max(cellid) AS max_cell,
           CAST(round(sum(x)) AS BIGINT) AS sum_x_m,
           CAST(round(sum(y)) AS BIGINT) AS sum_y_m
    FROM ({union})
    """


# --------------------------------------------------------------------------
# q_is_optimal — A10: single-pass optimality check; the raw seeded cover is
# collapsible (checked by an independent SQL existence test), the compacted
# one is optimal by construction (the oracle pins the invariant)
# --------------------------------------------------------------------------

OPT_RES = 3


def _seeded_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _docs_cells(spark, sf_dir, OPT_RES).dropDuplicates()
    k = DEFAULT_CONFIG.n_side ** 2
    seeded = cells.select(F.substring("cellid", 1, OPT_RES).alias("cellid")) \
        .distinct().withColumn("cellid", F.explode(F.expr(
            f"transform(sequence(0, {k - 1}), d -> concat(cellid, CAST(d AS STRING)))")))
    return cells.unionByName(seeded).dropDuplicates(["cellid"]) \
        .localCheckpoint(eager=True)


def q_is_optimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.auid import is_optimal, optimize_cells

    both = _seeded_cover(spark, sf_dir)
    raw_opt = is_optimal(both, DEFAULT_CONFIG.n_side)
    compacted = optimize_cells(both, DEFAULT_CONFIG.n_side)
    comp_opt = is_optimal(compacted, DEFAULT_CONFIG.n_side)
    return spark.createDataFrame(
        [(int(raw_opt), int(comp_opt))],
        "raw_is_optimal int, compacted_is_optimal int")


def _oracle_is_optimal() -> str:
    enc = _oracle_docs_cells(OPT_RES, [])
    k = DEFAULT_CONFIG.n_side ** 2
    return f"""
    WITH cover AS MATERIALIZED (SELECT DISTINCT cellid FROM ({enc})),
    seeded AS (SELECT DISTINCT concat(substring(cellid, 1, {OPT_RES}),
                                      CAST(d AS VARCHAR)) AS cellid
               FROM cover, range({k}) t(d)),
    cells AS MATERIALIZED (SELECT cellid FROM cover UNION SELECT cellid FROM seeded),
    anc AS (SELECT DISTINCT substring(cellid, 1, CAST(l AS INT)) AS cellid
            FROM cells, range(1, {OPT_RES + 1}) t(l) WHERE l < length(cellid)),
    pure AS (SELECT cellid FROM cells WHERE cellid NOT IN (SELECT cellid FROM anc)),
    tot AS (SELECT substring(cellid, 1, length(cellid) - 1) AS p, count(*) AS nt
            FROM cells WHERE length(cellid) > 1 GROUP BY 1),
    pur AS (SELECT substring(cellid, 1, length(cellid) - 1) AS p, count(*) AS np
            FROM pure WHERE length(cellid) > 1 GROUP BY 1)
    SELECT CAST(NOT EXISTS (SELECT 1 FROM tot JOIN pur USING (p)
                            WHERE nt = {k} AND np = {k}) AS INT) AS raw_is_optimal,
           CAST(1 AS INT) AS compacted_is_optimal
    """


# --------------------------------------------------------------------------
# q_stream_ingest — Structured Streaming: file source -> pandas-UDF encode ->
# watermarked windowed per-tile counts; complete-mode memory sink +
# availableNow makes the run deterministic (all windows, final counts)
# --------------------------------------------------------------------------

STREAM_RES = 5
STREAM_TILE = 2
STREAM_EPOCH = 1700000000


def _stream_tmpdirs(tag: str) -> "tuple[str, str, Callable[[], None]]":
    """Per-run-unique (src, checkpoint, cleanup) for a streaming query: a
    FIXED path under /tmp can be poisoned by a concurrent or killed prior
    run's checkpoint/offset state (the driver gate, bench, and pytest may
    interleave runs of the same query).  The memory-sink table lives in
    driver memory, so callers can cleanup() as soon as the query has
    terminated."""
    import tempfile

    base = tempfile.mkdtemp(prefix=f"dggs_{tag}_")
    return (os.path.join(base, "src"), os.path.join(base, "ckpt"),
            lambda: shutil.rmtree(base, ignore_errors=True))


def _finish_stream(q, timeout: int = 180) -> None:
    """availableNow queries normally self-terminate; stop a straggler so a
    timed-out run can't keep writing into a dir we're about to delete."""
    if not q.awaitTermination(timeout):
        q.stop()


def q_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources import synth
    from .streaming import ingest

    src, ckpt, cleanup = _stream_tmpdirs("stream_ingest")
    try:
        docs = synth.with_lonlat(load(spark, sf_dir, "documents"), "doc_id").select(
            "doc_id", "lon", "lat",
            F.timestamp_seconds(F.lit(STREAM_EPOCH) + F.col("doc_id") % 600)
            .alias("event_time"))
        docs.write.mode("overwrite").parquet(src)
        stream = ingest.read_doc_stream(
            spark, src,
            schema="doc_id bigint, lon double, lat double, event_time timestamp")
        counts = ingest.tile_counts_stream(stream, res=STREAM_RES,
                                           tile_res=STREAM_TILE, window="1 minute")
        try:  # a prior run in this session leaves the memory table behind
            spark.catalog.dropTempView("dggs_stream_tiles")
        except Exception:
            pass
        q = (counts.writeStream.format("memory").queryName("dggs_stream_tiles")
             .outputMode("complete").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        _finish_stream(q)
        tbl = spark.table("dggs_stream_tiles")
        return tbl.select(
            "tile",
            F.unix_timestamp(F.col("win.start")).alias("win_start"),
            "n_docs")
    finally:
        cleanup()


def _oracle_stream_ingest() -> str:
    enc = _oracle_docs_cells(STREAM_RES, ["doc_id"])
    return f"""
    SELECT substring(cellid, 1, {STREAM_TILE + 1}) AS tile,
           CAST(({STREAM_EPOCH} + doc_id % 600) // 60 * 60 AS BIGINT) AS win_start,
           count(*) AS n_docs
    FROM ({enc})
    GROUP BY 1, 2
    """


# --------------------------------------------------------------------------
# q_auid_roundtrip — A7/A8 verifiable: build the AUID per group INSIDE the
# executor (trie -> BP -> zlib -> b64), decode it back, and emit an md5 of
# the canonical cuid list — which the oracle recomputes from plain SQL.
# zlib/blake2b themselves have no SQL twin (auid_groups stays rows-only for
# the b64 value), but encode->decode FIDELITY is now oracle-gated.
# --------------------------------------------------------------------------

AUID_RT_RES = 3


def q_auid_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.types import (IntegerType, StringType, StructField,
                                   StructType)

    from .dggs import auids as auids_core

    cells = _docs_cells(spark, sf_dir, AUID_RT_RES, keep=["source"])

    schema = StructType([
        StructField("group_key", StringType()),
        StructField("n_cuids", IntegerType()),
        StructField("cuids_md5", StringType()),
    ])

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        cuids = pdf["cellid"].dropna().tolist()
        comp_b64, _ = auids_core.generate_auid_hash_b64(cuids)
        back = auids_core.cuids_from_auid_b64(comp_b64)
        joined = ",".join(back)  # decode returns the canonical sorted set
        return pd.DataFrame({
            "group_key": [str(pdf["source"].iloc[0])],
            "n_cuids": [len(back)],
            "cuids_md5": [hashlib.md5(joined.encode()).hexdigest()],
        })

    return cells.groupBy("source").applyInPandas(build, schema)


def _oracle_auid_roundtrip() -> str:
    enc = _oracle_docs_cells(AUID_RT_RES, ["source"])
    return f"""
    WITH cells AS (SELECT DISTINCT source, cellid FROM ({enc}))
    SELECT source AS group_key,
           CAST(count(*) AS INT) AS n_cuids,
           md5(string_agg(cellid, ',' ORDER BY cellid)) AS cuids_md5
    FROM cells GROUP BY source
    """


QUERIES4: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "tile_arrays": q_tile_arrays,
    "grid": q_grid,
    "is_optimal": q_is_optimal,
    "stream_ingest": q_stream_ingest,
    "auid_roundtrip": q_auid_roundtrip,
}

ORACLES4: dict[str, str] = {
    "tile_arrays": _oracle_tile_arrays(),
    "grid": _oracle_grid(),
    "is_optimal": _oracle_is_optimal(),
    "stream_ingest": _oracle_stream_ingest(),
    "auid_roundtrip": _oracle_auid_roundtrip(),
}


# --------------------------------------------------------------------------
# q_token_stats — whitespace vs BPE-ish subword token counts per source
# (training-data budgeting: subword inflation ratio)
# --------------------------------------------------------------------------

def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions import text as T

    docs = load(spark, sf_dir, "documents")
    return (docs
            .withColumn("ws", F.expr(T.token_count("text")))
            .withColumn("bpe", F.expr(T.token_count_bpe_spark("text")))
            .groupBy("source")
            .agg(F.sum("ws").cast("bigint").alias("ws_tokens"),
                 F.sum("bpe").cast("bigint").alias("bpe_tokens"),
                 F.round(F.sum("bpe") * 1e6 / F.sum("ws")).cast("bigint")
                 .alias("inflation_ppm")))


def _oracle_token_stats() -> str:
    from .functions import text as T

    return f"""
    SELECT source,
           CAST(sum({T.token_count('text')}) AS BIGINT) AS ws_tokens,
           CAST(sum({T.token_count_bpe_duckdb('text')}) AS BIGINT) AS bpe_tokens,
           CAST(round(sum({T.token_count_bpe_duckdb('text')}) * 1e6
                      / sum({T.token_count('text')})) AS BIGINT) AS inflation_ppm
    FROM documents GROUP BY source
    """


QUERIES4["token_stats"] = q_token_stats
ORACLES4["token_stats"] = _oracle_token_stats()


# --------------------------------------------------------------------------
# q_stream_stateful — applyInPandasWithState custom stateful operator:
# per-tile running totals whose state crosses micro-batches; the final
# totals (and the number of batches each tile's state saw) are
# batch-order-independent and oracle-checked
# --------------------------------------------------------------------------

SS_RES = 5
SS_TILE = 2


def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources import synth
    from .streaming import stateful

    src, ckpt, cleanup = _stream_tmpdirs("stream_stateful")
    try:
        docs = synth.with_lonlat(load(spark, sf_dir, "documents"), "doc_id") \
            .select("doc_id", "lon", "lat")
        # two files split by key parity -> two micro-batches under
        # maxFilesPerTrigger=1, so the state genuinely crosses batches
        docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(src)
        docs.filter(F.col("doc_id") % 2 == 1).coalesce(1) \
            .write.mode("append").parquet(src)
        stream = (spark.readStream.schema("doc_id bigint, lon double, lat double")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        running = stateful.running_tile_counts(stream, res=SS_RES, tile_res=SS_TILE)
        try:
            spark.catalog.dropTempView("dggs_stream_stateful")
        except Exception:
            pass
        q = (running.writeStream.format("memory").queryName("dggs_stream_stateful")
             .outputMode("update").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        _finish_stream(q)
        tbl = spark.table("dggs_stream_stateful")
        return tbl.groupBy("tile").agg(
            F.max("total_docs").cast("bigint").alias("total_docs"),
            F.max("n_batches").cast("int").alias("n_batches"))
    finally:
        cleanup()


def _oracle_stream_stateful() -> str:
    enc = _oracle_docs_cells(SS_RES, ["doc_id"])
    return f"""
    SELECT substring(cellid, 1, {SS_TILE + 1}) AS tile,
           count(*) AS total_docs,
           CAST(count(DISTINCT doc_id % 2) AS INT) AS n_batches
    FROM ({enc}) GROUP BY 1
    """


QUERIES4["stream_stateful"] = q_stream_stateful
ORACLES4["stream_stateful"] = _oracle_stream_stateful()
