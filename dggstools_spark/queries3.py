"""Driver-contract queries, batch 3: the round-2 gate-closers.

Converts pytest-only operators into oracle-checked driver rows (VERDICT.md
round 1, top next): extent (A4/A5), nodata+stride raster decode (F1/F4/R4),
rescale agg modes (R2), relational subarea (J6), planar line error (A6),
cell-table IO roundtrip with prefix pruning (S3/S4/S10), and the
checkpoint/resume MERGE path (R5).  Every oracle reuses the shared portable
snippet generators (functions/encode_sql.py) so float results are
bit-identical across engines; outputs are quantized to integers.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dggs.config import DEFAULT_CONFIG

#: flagship cell resolution shared by the registry (lives here — a leaf
#: module — so queries16+ can import it without circling through queries.py)
CELL_RES = 5
from .functions import encode_sql
from .operators import metrics
from .operators import spatial_join as spatial_join_mod
from .operators.auid import subarea_pairs
from .operators.raster import rescale_to_parent, tiles_to_cells
from .sources import synth


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_cells(spark: SparkSession, sf_dir: str, res: int,
                keep: list[str] | None = None) -> DataFrame:
    docs = synth.with_lonlat(load(spark, sf_dir, "documents"), "doc_id")
    return encode_sql.spark_encode(docs, "lon", "lat", res).select(
        *(keep or []), "cellid")


def _docs_cells_udf(spark: SparkSession, sf_dir: str, res: int,
                    keep: list[str] | None = None) -> DataFrame:
    """_docs_cells via the numpy-kernel Arrow UDF encode.

    WARNING — NOT oracle-parity-safe (r7 measured finding, DO NOT swap
    oracle-checked queries onto this path): the kernel and the shared
    expression/DuckDB formula DIVERGE on inputs that land EXACTLY on a
    cell boundary — sf0.1 events has one (lon = 40.0 exactly →
    kernel 'Q14…' vs formula 'Q13…' at res ≥ 2), which flipped six
    events-encode queries' hashes when r7 briefly swapped them (the
    adversarial parity test jitters ±EPS around corners but never
    exactly 0, and sf0.01 happened to contain no boundary point).
    cell_counts uses the UDF path by CONTRACT (its oracle has always
    matched on the gated data), but any NEW swap risks a hash flip at
    an unseen scale factor.  Kept for non-oracle/UX use only."""
    from .functions.encode import cellid_from_lonlat_udf

    docs = synth.with_lonlat(load(spark, sf_dir, "documents"), "doc_id")
    enc = cellid_from_lonlat_udf(res)
    cols = [F.col(c) for c in (keep or [])]
    return docs.select(*cols, enc("lon", "lat").alias("cellid"))


def _oracle_docs_cells(res: int, keep: list[str]) -> str:
    src = synth.duckdb_lonlat_select("documents", "doc_id", ["doc_id"] + keep)
    return encode_sql.duckdb_encode_select(f"({src})", "lon", "lat", res, keep)


# --------------------------------------------------------------------------
# q_extent — A4/A5: planar bbox + raster height/width of a cell table
# --------------------------------------------------------------------------

EXTENT_RES = 4


def q_extent(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _docs_cells(spark, sf_dir, EXTENT_RES)
    ext = metrics.extent(cells, EXTENT_RES)
    return ext.select(
        F.round("left").cast("bigint").alias("left_m"),
        F.round("right").cast("bigint").alias("right_m"),
        F.round("top").cast("bigint").alias("top_m"),
        F.round("bottom").cast("bigint").alias("bottom_m"),
        "width", "height",
    )


def _oracle_extent() -> str:
    from .dggs.cells import HALF_SIDE

    enc = _oracle_docs_cells(EXTENT_RES, [])
    lx, ty = encode_sql.cell_ul_meters_sql("cellid", EXTENT_RES)
    w = float(HALF_SIDE / DEFAULT_CONFIG.n_side**EXTENT_RES)
    return f"""
    WITH pts AS (SELECT ({lx}) AS lx, ({ty}) AS ty FROM ({enc})),
    ext AS (SELECT min(lx) AS lft, max(lx) + {w!r} AS rgt,
                   max(ty) AS top, min(ty) - {w!r} AS bot FROM pts)
    SELECT CAST(round(lft) AS BIGINT) AS left_m,
           CAST(round(rgt) AS BIGINT) AS right_m,
           CAST(round(top) AS BIGINT) AS top_m,
           CAST(round(bot) AS BIGINT) AS bottom_m,
           CAST(round((rgt - lft) / {w!r}) AS INT) AS width,
           CAST(round((top - bot) / {w!r}) AS INT) AS height
    FROM ext
    """


# --------------------------------------------------------------------------
# q_nodata_stride — F1 nodata filter + F4 stride sampling over R4 decode
# --------------------------------------------------------------------------

NODATA_RES = 4


def q_nodata_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    tiles = part.select(
        F.lit("Q").alias("face"),
        (F.col("p_partkey") % 81).alias("row"),
        F.floor(F.col("p_partkey") / 81).cast("bigint").alias("col"),
        ((F.col("p_partkey") * 7) % 23).cast("double").alias("band1"),
    )
    cells = tiles_to_cells(tiles, NODATA_RES, nodata=0.0)
    strided = cells.filter((F.col("row") % 2 == 0) & (F.col("col") % 3 == 0))
    return strided.agg(
        F.count("*").alias("n_pixels"),
        F.sum("band1").cast("bigint").alias("sum_v"),
        F.min("cellid").alias("min_cell"),
        F.max("cellid").alias("max_cell"),
    )


def _oracle_nodata_stride() -> str:
    cellid = encode_sql.rowcol_cellid_sql("'Q'", "row", "col", NODATA_RES)
    return f"""
    WITH tiles AS (
      SELECT p_partkey % 81 AS row,
             CAST(floor(p_partkey / 81.0) AS BIGINT) AS col,
             CAST((p_partkey * 7) % 23 AS DOUBLE) AS band1
      FROM part),
    cells AS (SELECT *, {cellid} AS cellid FROM tiles WHERE band1 != 0.0),
    strided AS (SELECT * FROM cells WHERE row % 2 = 0 AND col % 3 = 0)
    SELECT count(*) AS n_pixels, CAST(sum(band1) AS BIGINT) AS sum_v,
           min(cellid) AS min_cell, max(cellid) AS max_cell
    FROM strided
    """


# --------------------------------------------------------------------------
# q_rescale_modes — R2: one parent rollup per agg mode (avg/min/max/mode/first)
# --------------------------------------------------------------------------

RESCALE_RES = 5
RESCALE_LEVELS = 2


def q_rescale_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    enc = _docs_cells(spark, sf_dir, RESCALE_RES, keep=["doc_id"])
    cells = enc.groupBy("cellid").agg(
        F.min((F.col("doc_id") * 31) % 97).cast("double").alias("band1"))
    # one lineage cut feeds five rollup branches (CLAUDE.md constraint 2)
    cells = cells.localCheckpoint(eager=False)
    outs = {}
    for mode in ("avg", "min", "max", "mode", "first"):
        outs[mode] = rescale_to_parent(cells, RESCALE_LEVELS, mode) \
            .withColumnRenamed("band1", f"v_{mode}")
    out = outs["avg"]
    for mode in ("min", "max", "mode", "first"):
        out = out.join(outs[mode], "cellid")
    return out.select(
        "cellid",
        F.round(F.col("v_avg") * 1e6).cast("bigint").alias("avg_ppm"),
        F.col("v_min").cast("bigint").alias("min_v"),
        F.col("v_max").cast("bigint").alias("max_v"),
        F.col("v_mode").cast("bigint").alias("mode_v"),
        F.col("v_first").cast("bigint").alias("first_v"),
    )


def _oracle_rescale_modes() -> str:
    enc = _oracle_docs_cells(RESCALE_RES, ["doc_id"])
    k = RESCALE_LEVELS
    return f"""
    WITH cells AS (
      SELECT cellid, CAST(min((doc_id * 31) % 97) AS DOUBLE) AS band1
      FROM ({enc}) GROUP BY cellid),
    par AS (SELECT substring(cellid, 1, length(cellid) - {k}) AS pcell, band1, cellid
            FROM cells),
    basic AS (SELECT pcell, avg(band1) AS v_avg, min(band1) AS v_min,
                     max(band1) AS v_max, min_by(band1, cellid) AS v_first
              FROM par GROUP BY pcell),
    counts AS (SELECT pcell, band1, count(*) AS _n FROM par GROUP BY 1, 2),
    modes AS (SELECT pcell, band1 AS v_mode FROM (
        SELECT pcell, band1,
               row_number() OVER (PARTITION BY pcell ORDER BY _n DESC, band1) AS rk
        FROM counts) WHERE rk = 1)
    SELECT b.pcell AS cellid,
           CAST(round(v_avg * 1e6) AS BIGINT) AS avg_ppm,
           CAST(v_min AS BIGINT) AS min_v,
           CAST(v_max AS BIGINT) AS max_v,
           CAST(v_mode AS BIGINT) AS mode_v,
           CAST(v_first AS BIGINT) AS first_v
    FROM basic b JOIN modes USING (pcell)
    """


# --------------------------------------------------------------------------
# q_subarea — J6 relationally: fine per-source covers vs coarse per-lang covers
# --------------------------------------------------------------------------

SUB_FINE_RES = 2
SUB_COARSE_RES = 1


def q_subarea(spark: SparkSession, sf_dir: str) -> DataFrame:
    fine = _docs_cells(spark, sf_dir, SUB_FINE_RES, keep=["source"]) \
        .withColumnRenamed("source", "group_a")
    coarse = _docs_cells(spark, sf_dir, SUB_COARSE_RES, keep=["lang"]) \
        .withColumnRenamed("lang", "group_b")
    # lineage cut: subarea_pairs references each side several times and
    # CollapseProject would inline the expression encoder into every copy
    # (CLAUDE.md constraint 2)
    fine = fine.dropDuplicates().localCheckpoint(eager=False)
    coarse = coarse.dropDuplicates().localCheckpoint(eager=False)
    return subarea_pairs(fine, coarse)


def _oracle_subarea() -> str:
    enc_f = _oracle_docs_cells(SUB_FINE_RES, ["source"])
    enc_c = _oracle_docs_cells(SUB_COARSE_RES, ["lang"])
    return f"""
    WITH fine AS (SELECT DISTINCT source AS group_a, cellid FROM ({enc_f})),
    coarse AS (SELECT DISTINCT lang AS group_b, cellid FROM ({enc_c})),
    pfx AS (SELECT group_a, cellid, substring(cellid, 1, CAST(l AS INT)) AS _pfx
            FROM fine, range(1, {SUB_FINE_RES + 2}) t(l)
            WHERE l <= length(cellid)),
    hits AS (SELECT DISTINCT p.group_a, c.group_b, p.cellid
             FROM pfx p JOIN coarse c ON p._pfx = c.cellid),
    na AS (SELECT group_a, count(*) AS _na FROM fine GROUP BY group_a),
    nc AS (SELECT group_a, group_b, count(*) AS _nc FROM hits GROUP BY 1, 2),
    dom AS (SELECT group_a, _na, group_b
            FROM na CROSS JOIN (SELECT DISTINCT group_b FROM coarse))
    SELECT group_a, group_b,
           CAST(coalesce(_nc, 0) = _na AS INT) AS is_subarea
    FROM dom LEFT JOIN nc USING (group_a, group_b)
    """


# --------------------------------------------------------------------------
# q_line_error — A6 planar variant: node<->assigned-cell-centroid distance
# --------------------------------------------------------------------------

LINE_RES = 5


def q_line_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = synth.with_lonlat(load(spark, sf_dir, "nation"), "n_nationkey")
    assigned = encode_sql.spark_encode(nodes, "lon", "lat", LINE_RES,
                                       with_planar=True) \
        .select("cellid", "px_m", "py_m", "cx_m", "cy_m")
    cells = _docs_cells(spark, sf_dir, LINE_RES)
    # lineage cuts: assigned feeds the semi- AND anti-join branches, cells
    # the distinct side of both — CollapseProject would inline the encode
    # tree into each reference (CLAUDE.md constraint 2)
    assigned = assigned.localCheckpoint(eager=False)
    cells = cells.localCheckpoint(eager=False)
    out = metrics.line_error_planar(assigned, cells, LINE_RES)
    return out.select(
        F.round("mean_node_error_m").cast("bigint").alias("mean_err_m"),
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
    )


def _oracle_line_error() -> str:
    src_n = synth.duckdb_lonlat_select("nation", "n_nationkey", ["n_nationkey"])
    enc_n = encode_sql.duckdb_encode_select(f"({src_n})", "lon", "lat",
                                            LINE_RES, [], with_planar=True)
    enc_d = _oracle_docs_cells(LINE_RES, [])
    penalty = float(DEFAULT_CONFIG.cell_width(LINE_RES))
    return f"""
    WITH nodes AS ({enc_n}),
    cells AS (SELECT DISTINCT cellid FROM ({enc_d})),
    err AS (
      SELECT CASE WHEN n.cellid IN (SELECT cellid FROM cells)
                  THEN sqrt((px_m - cx_m) * (px_m - cx_m)
                            + (py_m - cy_m) * (py_m - cy_m))
                  ELSE {penalty!r} END AS err_m
      FROM nodes n)
    SELECT CAST(round(avg(err_m)) AS BIGINT) AS mean_err_m,
           count(*) AS n_nodes
    FROM err
    """


# --------------------------------------------------------------------------
# q_cells_io — S3/S4/S10: write prefix-partitioned cell table, prefix-pruned
# read-back, metadata sidecar roundtrip
# --------------------------------------------------------------------------

IO_RES = 3

#: per-tag run dirs for queries whose RESULT DataFrame lazily reads files
#: the query wrote (cells_io, merge_resume): a fixed /tmp path could be
#: clobbered by a concurrent run between query build and the driver's
#: collect (same hazard class the streaming queries fixed in r4).  The
#: previous run's dir (same process) is removed on the next call; the
#: current one must outlive the returned DataFrame, so it stays on disk
#: until then.
_RUN_DIRS: dict = {}


def _run_dir(tag: str) -> str:
    import tempfile

    old = _RUN_DIRS.pop(tag, None)
    if old:
        shutil.rmtree(old, ignore_errors=True)
    d = tempfile.mkdtemp(prefix=f"dggs_{tag}_")
    _RUN_DIRS[tag] = d
    return os.path.join(d, "t")


def q_cells_io(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources import cells_io

    io_path = _run_dir("q_cells_io")
    enc = _docs_cells(spark, sf_dir, IO_RES, keep=["doc_id"])
    cells = enc.groupBy("cellid").agg(
        F.count("*").cast("double").alias("band1"))
    attrs = cells_io.build_attrs(IO_RES, 1, None)
    cells_io.write_cells(cells, io_path, attrs, prefix_len=2)
    back, attrs2 = cells_io.read_cells(spark, io_path, prefix="Q")
    assert attrs2["res_idx"] == IO_RES, "metadata sidecar roundtrip broke"
    return back.agg(
        F.count("*").alias("n_cells"),
        F.sum("band1").cast("bigint").alias("total_docs"),
    ).select("*", F.lit(int(attrs2["res_idx"])).alias("res_idx"))


def _oracle_cells_io() -> str:
    enc = _oracle_docs_cells(IO_RES, [])
    # AS MATERIALIZED: a predicate on cellid would otherwise be pushed into
    # the nested encode projections, inlining the ~50k-node cellid expression
    # into the filter (the DuckDB edition of CLAUDE.md constraint 2)
    return f"""
    WITH enc AS MATERIALIZED ({enc}),
    cells AS (SELECT cellid, count(*) AS n FROM enc
              WHERE substring(cellid, 1, 1) = 'Q' GROUP BY cellid)
    SELECT count(*) AS n_cells, CAST(sum(n) AS BIGINT) AS total_docs,
           CAST({IO_RES} AS INT) AS res_idx
    FROM cells
    """


# --------------------------------------------------------------------------
# q_merge_resume — R5: checkpointed batch write, crash, resume; the final
# table state (and which batches the resume wrote) is the oracle-checked fact
# --------------------------------------------------------------------------

MERGE_RES = 3
FIRST_BATCHES = ("N", "O")


def q_merge_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .plans import lineage

    merge_path = _run_dir("q_merge_resume")
    enc = _docs_cells(spark, sf_dir, MERGE_RES, keep=["doc_id"])
    cells = enc.groupBy("cellid").agg(F.count("*").alias("n_docs")) \
        .withColumn("batch", F.substring("cellid", 1, 1))
    # materialize once: the batch loop + resume re-reference cells many
    # times (filter, count, lineage agg, write) and pushing the batch
    # predicate through the encode lineage re-inlines the expression
    # encoder per job (CLAUDE.md constraint 2)
    cells = cells.localCheckpoint(eager=True)
    # phase 1: "the run that crashed" — only two batches complete
    for k in FIRST_BATCHES:
        part = cells.filter(F.col("batch") == k)
        if not part.isEmpty():
            lineage.checkpointed_write(part, merge_path, k, ["cellid"])
    # phase 2: resume writes exactly the remaining batches in ONE job
    results = lineage.run_batches(cells, merge_path, "batch", ["cellid"])
    for k, wrote in results.items():
        expect = k not in FIRST_BATCHES
        assert wrote == expect, f"resume invariant broke for batch {k}"
    back = spark.read.parquet(f"{merge_path}/data")
    return back.groupBy("batch_key").agg(
        F.count("*").alias("n_cells"),
        F.sum("n_docs").cast("bigint").alias("total_docs"),
    ).select(
        "batch_key", "n_cells", "total_docs",
        F.when(F.col("batch_key").isin(*FIRST_BATCHES), 0).otherwise(1)
        .cast("int").alias("resumed"),
    )


def _oracle_merge_resume() -> str:
    enc = _oracle_docs_cells(MERGE_RES, [])
    first = ", ".join(f"'{k}'" for k in FIRST_BATCHES)
    return f"""
    WITH cells AS (SELECT cellid, count(*) AS n FROM ({enc}) GROUP BY cellid)
    SELECT substring(cellid, 1, 1) AS batch_key,
           count(*) AS n_cells,
           CAST(sum(n) AS BIGINT) AS total_docs,
           CAST(CASE WHEN substring(cellid, 1, 1) IN ({first}) THEN 0 ELSE 1 END AS INT) AS resumed
    FROM cells GROUP BY 1, 4
    """


# --------------------------------------------------------------------------
# q_resample_bilinear / q_resample_cubic — R1: the oracle replicates the
# relational corner-gather joins themselves (weights, edge renormalization
# and all), so the check covers the full operator semantics
# --------------------------------------------------------------------------

RS_SRC, RS_DST = 2, 3


def _spark_src_raster(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    grid = part.select(
        (F.col("p_partkey") % 9).alias("row"),
        (F.floor(F.col("p_partkey") / 9).cast("bigint") % 9).alias("col"),
    ).distinct()
    return grid.select(
        F.expr(encode_sql.rowcol_cellid_sql("'Q'", "row", "col", RS_SRC)).alias("cellid"),
        ((F.col("row") * 31 + F.col("col") * 17) % 97).cast("double").alias("band1"),
    )


_ORACLE_SRC_RASTER = f"""
      SELECT {encode_sql.rowcol_cellid_sql("'Q'", "row", "col", RS_SRC)} AS cellid,
             row AS srow, col AS scol,
             CAST((row * 31 + col * 17) % 97 AS DOUBLE) AS v
      FROM (SELECT DISTINCT p_partkey % 9 AS row,
                   CAST(floor(p_partkey / 9.0) AS BIGINT) % 9 AS col FROM part)
"""


def q_resample_bilinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.resample import resample_bilinear

    src = _spark_src_raster(spark, sf_dir)
    out = resample_bilinear(src, RS_SRC, RS_DST)
    return out.select(
        "cellid", F.round(F.col("band1") * 1e6).cast("bigint").alias("v_ppm"))


def _oracle_resample_bilinear() -> str:
    row_dec, col_dec = encode_sql.decode_rowcol_sql("cellid", RS_DST)
    ratio = DEFAULT_CONFIG.n_side ** (RS_DST - RS_SRC)
    k = DEFAULT_CONFIG.n_side ** 2
    return f"""
    WITH src AS ({_ORACLE_SRC_RASTER}),
    tgt AS (SELECT concat(cellid, CAST(d AS VARCHAR)) AS cellid
            FROM src, range({k}) t(d)),
    uv AS (SELECT cellid,
                  (({col_dec}) + 0.5) / {ratio} - 0.5 AS u,
                  (({row_dec}) + 0.5) / {ratio} - 0.5 AS v
           FROM tgt),
    base AS (SELECT cellid, CAST(floor(u) AS BIGINT) AS i0,
                    CAST(floor(v) AS BIGINT) AS j0,
                    u - floor(u) AS fu, v - floor(v) AS fv FROM uv),
    corners AS (SELECT cellid, i0 + c.di AS scol, j0 + c.dj AS srow,
                       (CASE WHEN c.di = 1 THEN fu ELSE 1 - fu END)
                       * (CASE WHEN c.dj = 1 THEN fv ELSE 1 - fv END) AS w
                FROM base CROSS JOIN (VALUES (0, 0), (1, 0), (0, 1), (1, 1)) c(di, dj)),
    joined AS (SELECT t.cellid, t.w, s.v
               FROM corners t JOIN src s ON t.srow = s.srow AND t.scol = s.scol)
    SELECT cellid, CAST(round(sum(w * v) / sum(w) * 1e6) AS BIGINT) AS v_ppm
    FROM joined GROUP BY cellid
    """


def q_resample_cubic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.resample import resample_cubic

    src = _spark_src_raster(spark, sf_dir)
    out = resample_cubic(src, RS_SRC, RS_DST)
    return out.select(
        "cellid", F.round(F.col("band1") * 1e6).cast("bigint").alias("v_ppm"))


def _oracle_resample_cubic() -> str:
    from .operators.resample import cubic_weights_sql

    row_dec, col_dec = encode_sql.decode_rowcol_sql("cellid", RS_DST)
    ratio = DEFAULT_CONFIG.n_side ** (RS_DST - RS_SRC)
    k = DEFAULT_CONFIG.n_side ** 2
    wx = cubic_weights_sql("fu")
    wy = cubic_weights_sql("fv")
    wx_case = "CASE c.di " + " ".join(f"WHEN {i} THEN {w}" for i, w in enumerate(wx)) + " ELSE 0.0 END"
    wy_case = "CASE c.dj " + " ".join(f"WHEN {i} THEN {w}" for i, w in enumerate(wy)) + " ELSE 0.0 END"
    return f"""
    WITH src AS ({_ORACLE_SRC_RASTER}),
    tgt AS (SELECT concat(cellid, CAST(d AS VARCHAR)) AS cellid
            FROM src, range({k}) t(d)),
    uv AS (SELECT cellid,
                  (({col_dec}) + 0.5) / {ratio} - 0.5 AS u,
                  (({row_dec}) + 0.5) / {ratio} - 0.5 AS v
           FROM tgt),
    base AS (SELECT cellid, CAST(floor(u) AS BIGINT) AS i0,
                    CAST(floor(v) AS BIGINT) AS j0,
                    u - floor(u) AS fu, v - floor(v) AS fv FROM uv),
    corners AS (SELECT cellid, i0 - 1 + c.di AS scol, j0 - 1 + c.dj AS srow,
                       ({wx_case}) * ({wy_case}) AS w
                FROM base CROSS JOIN (SELECT di, dj FROM range(4) a(di), range(4) b(dj)) c),
    joined AS (SELECT t.cellid, t.w, s.v
               FROM corners t JOIN src s ON t.srow = s.srow AND t.scol = s.scol)
    SELECT cellid, CAST(round(sum(w * v) / sum(w) * 1e6) AS BIGINT) AS v_ppm
    FROM joined GROUP BY cellid
    """


# --------------------------------------------------------------------------
# q_all_touched — J2 all_touched variant: center-burn UNION edge-intersecting
# cells (exact SAT); q_area_error — the reference's composed headline metric
# (vec-ras-area-error).  Shared fixture: diamonds kept strictly inside the
# equatorial band so every lattice candidate is on-cube (planar cell count ==
# distinct (ci, ri) count in the oracle).
# --------------------------------------------------------------------------

AT_RES = 4


def _d(x: float) -> str:
    """Float literal pinned to DOUBLE (DuckDB types wide decimals DECIMAL)."""
    return f"CAST({float(x)!r} AS DOUBLE)"


def _safe_diamond_sql(key: str) -> tuple[str, str, str]:
    from .dggs.cells import HALF_SIDE

    s = float(HALF_SIDE)
    cx = (f"({_d(-1.7 * s)} + ((CAST({key} AS BIGINT) * 7919) % 40000)"
          f" / 40000.0 * {_d(3.4 * s)})")
    cy = (f"({_d(-0.2 * s)} + ((CAST({key} AS BIGINT) * 104729) % 9000)"
          f" / 9000.0 * {_d(0.4 * s)})")
    rad = f"((0.05 + (CAST({key} AS BIGINT) % 5) * 0.04) * {_d(s)})"
    return cx, cy, rad


def _safe_diamonds(spark: SparkSession, sf_dir: str) -> DataFrame:
    cx, cy, rad = _safe_diamond_sql("r_regionkey")
    return load(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("poly_id"),
        F.expr(
            f"array(named_struct('x', {cx} + {rad}, 'y', {cy}),"
            f" named_struct('x', {cx}, 'y', {cy} + {rad}),"
            f" named_struct('x', {cx} - {rad}, 'y', {cy}),"
            f" named_struct('x', {cx}, 'y', {cy} - {rad}))"
        ).alias("ring"),
    )


def _oracle_diamond_ctes(res: int, table: str = "region",
                         key: str = "r_regionkey",
                         triple=None, p: str = "") -> str:
    """CTEs dia/edges/bbox/cand replicating rasterize_polygons' candidate
    lattice over the band-safe diamonds.  ``table``/``key``/``triple``
    pick the source layer (default: the region diamonds), ``p`` prefixes
    every CTE name so two layers can coexist in one query (overlay) —
    defaults emit byte-identical text to the original single-layer form,
    so the committed all_touched/area_error oracles do not move."""
    from .dggs.cells import HALF_SIDE

    cx, cy, rad = (triple or _safe_diamond_sql)(key)
    w = float(HALF_SIDE / DEFAULT_CONFIG.n_side**res)
    gx0 = float(-2.0 * HALF_SIDE)
    gy0 = float(1.5 * HALF_SIDE)
    edges = " UNION ALL ".join([
        f"SELECT poly_id, cx + rad AS x1, cy AS y1, cx AS x2, cy + rad AS y2 FROM {p}dia",
        f"SELECT poly_id, cx, cy + rad, cx - rad, cy FROM {p}dia",
        f"SELECT poly_id, cx - rad, cy, cx, cy - rad FROM {p}dia",
        f"SELECT poly_id, cx, cy - rad, cx + rad, cy FROM {p}dia",
    ])
    return f"""
    {p}dia AS (SELECT {key} AS poly_id, {cx} AS cx, {cy} AS cy, {rad} AS rad
            FROM {table}),
    {p}edges AS ({edges}),
    {p}bbox AS (SELECT poly_id,
                    least(cx + rad, cx, cx - rad) AS xmin,
                    greatest(cx + rad, cx, cx - rad) AS xmax,
                    least(cy + rad, cy, cy - rad) AS ymin,
                    greatest(cy + rad, cy, cy - rad) AS ymax
             FROM {p}dia),
    {p}cis AS (SELECT poly_id, ymin, ymax,
                   unnest(range(CAST(floor((xmin - {_d(gx0)}) / {_d(w)}) AS BIGINT),
                                CAST(floor((xmax - {_d(gx0)}) / {_d(w)}) AS BIGINT) + 1)) AS ci
            FROM {p}bbox),
    {p}ris AS (SELECT poly_id, ci,
                   unnest(range(CAST(floor(({_d(gy0)} - ymax) / {_d(w)}) AS BIGINT),
                                CAST(floor(({_d(gy0)} - ymin) / {_d(w)}) AS BIGINT) + 1)) AS ri
            FROM {p}cis),
    {p}cand AS (SELECT poly_id, {_d(gx0)} + (ci + 0.5) * {_d(w)} AS px,
                    {_d(gy0)} - (ri + 0.5) * {_d(w)} AS py
             FROM {p}ris),
    {p}inside AS (SELECT c.poly_id, px, py
               FROM {p}cand c JOIN {p}edges e ON c.poly_id = e.poly_id
               WHERE {spatial_join_mod.CROSSING}
               GROUP BY 1, 2, 3 HAVING count(*) % 2 = 1)
    """


def q_all_touched(spark: SparkSession, sf_dir: str) -> DataFrame:
    polys = _safe_diamonds(spark, sf_dir)
    cells = spatial_join_mod.rasterize_polygons(polys, AT_RES, all_touched=True)
    return cells.groupBy("poly_id").agg(F.count("*").alias("n_cells"))


def _oracle_all_touched() -> str:
    from .dggs.cells import HALF_SIDE

    w = float(HALF_SIDE / DEFAULT_CONFIG.n_side**AT_RES)
    sat = spatial_join_mod.sat_edge_rect_sql(w / 2.0)
    return f"""
    WITH {_oracle_diamond_ctes(AT_RES)},
    touched AS (SELECT DISTINCT c.poly_id, px, py
                FROM cand c JOIN edges e ON c.poly_id = e.poly_id
                WHERE {sat}),
    allc AS (SELECT * FROM inside UNION SELECT * FROM touched)
    SELECT poly_id, count(*) AS n_cells FROM allc GROUP BY poly_id
    """


def q_area_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    polys = _safe_diamonds(spark, sf_dir).withColumn(
        "class", (F.col("poly_id") % 2).cast("int"))
    out = metrics.area_error(polys, AT_RES, class_col="class")
    return out.select(
        F.round(F.col("rmse") / 1e6).cast("bigint").alias("rmse_km2"),
        F.round(F.col("bias") / 1e6).cast("bigint").alias("bias_km2"),
        F.round(F.col("total_vector_area") / 1e6).cast("bigint").alias("vec_km2"),
        F.round(F.col("total_cells_area") / 1e6).cast("bigint").alias("ras_km2"),
    )


def _oracle_area_error() -> str:
    cell_area = float(DEFAULT_CONFIG.cell_area(AT_RES))
    return f"""
    WITH {_oracle_diamond_ctes(AT_RES)},
    vec AS (
      SELECT CAST(poly_id % 2 AS INT) AS class,
             sum(area_p) AS _vec
      FROM (SELECT poly_id, abs(sum(x1 * y2 - x2 * y1)) / 2.0 AS area_p
            FROM edges GROUP BY poly_id)
      GROUP BY 1),
    -- burn-overwrite: a cell covered by several polygons keeps ONE class —
    -- the last-drawn (highest poly_id) wins, mirroring metrics.area_error
    ras AS (
      SELECT class, count(*) * {_d(cell_area)} AS _ras
      FROM (SELECT px, py, CAST(max(poly_id) % 2 AS INT) AS class
            FROM inside GROUP BY px, py)
      GROUP BY class),
    per_class AS (
      SELECT coalesce(v._vec, 0.0) AS _vec, coalesce(r._ras, 0.0) AS _ras
      FROM vec v FULL JOIN ras r USING (class))
    SELECT CAST(round(sqrt(avg((_ras - _vec) * (_ras - _vec))) / 1e6) AS BIGINT) AS rmse_km2,
           CAST(round(avg(_ras - _vec) / 1e6) AS BIGINT) AS bias_km2,
           CAST(round(sum(_vec) / 1e6) AS BIGINT) AS vec_km2,
           CAST(round(sum(_ras) / 1e6) AS BIGINT) AS ras_km2
    FROM per_class
    """


# --------------------------------------------------------------------------
# q_ann_topk — bucketed ANN search (LSH probes + exact rerank), the scale
# sibling of brute-force q_embed_knn; the deterministic approximate
# construction itself is oracle-checked, recall vs brute force is pytest'd
# --------------------------------------------------------------------------

ANN_K = 3
ANN_PLANES = 6
ANN_HAMMING = 2
EMB_DIM = 64  # synth embeddings width; compiles cosine folds flat (codegen)


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import ann_topk

    emb = load(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    # max_bucket=None: the oracle replicates the UNguarded construction —
    # the hot-bucket cap is an operator default covered by skew pytest
    # fixtures, and replicating it in SQL would re-implement the guard
    # rather than independently check the search
    out = ann_topk(emb, qs, ANN_K, n_planes=ANN_PLANES, probe_hamming=ANN_HAMMING,
                   max_bucket=None, dim=EMB_DIM)
    return out.select(
        "q_id", F.col("vec_id").alias("cand_id"),
        F.round(F.col("sim") * 1e9).cast("bigint").alias("sim_nano"),
        "rank")


def _oracle_ann_topk() -> str:
    from .operators.similarity import (DOT_DUCK, NRM_DUCK, probe_buckets_sql,
                                       signature_duckdb)

    sig = signature_duckdb("embedding", ANN_PLANES)
    probes = ", ".join(probe_buckets_sql("bucket0", ANN_PLANES, ANN_HAMMING))
    dot = DOT_DUCK.format(a="q_emb", b="embedding")
    nrm_q = NRM_DUCK.format(v="q_emb")
    nrm_c = NRM_DUCK.format(v="embedding")
    return f"""
    WITH csig AS (SELECT vec_id, embedding, {sig} AS bucket FROM embeddings),
    qsig AS (SELECT vec_id AS q_id, embedding AS q_emb, {sig} AS bucket0
             FROM embeddings WHERE vec_id % 50 = 0),
    probes AS (SELECT q_id, q_emb, unnest([{probes}]) AS bucket FROM qsig),
    pairs AS (
      SELECT p.q_id, c.vec_id AS cand_id,
             round(({dot}) / ({nrm_q} * {nrm_c}), 9) AS sim
      FROM probes p JOIN csig c ON p.bucket = c.bucket
      WHERE c.vec_id != p.q_id)
    SELECT q_id, cand_id, CAST(round(sim * 1e9) AS BIGINT) AS sim_nano, rank
    FROM (SELECT q_id, cand_id, sim,
                 row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS rank
          FROM pairs)
    WHERE rank <= {ANN_K}
    """


# --------------------------------------------------------------------------
# q_embed_pairs — embedding near-dup pair generation (bucket join + exact
# cosine verify), now oracle-checked thanks to the portable planes
# --------------------------------------------------------------------------

EP_THRESHOLD = 0.15
EP_PLANES = 6


def q_embed_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import embedding_cosine_pairs

    emb = load(spark, sf_dir, "embeddings")
    # max_bucket=None: oracle equivalence needs the unguarded construction
    # (see q_ann_topk note); the cap is pytest-covered
    return embedding_cosine_pairs(emb, "embedding", "vec_id",
                                  threshold=EP_THRESHOLD, n_planes=EP_PLANES,
                                  max_bucket=None, dim=EMB_DIM)


def _oracle_embed_pairs() -> str:
    from .operators.similarity import DOT_DUCK, NRM_DUCK, signature_duckdb

    sig = signature_duckdb("embedding", EP_PLANES)
    dot = DOT_DUCK.format(a="a_vec", b="b_vec")
    nrm_a = NRM_DUCK.format(v="a_vec")
    nrm_b = NRM_DUCK.format(v="b_vec")
    return f"""
    WITH sig AS (SELECT vec_id, embedding, {sig} AS bucket FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             a.embedding AS a_vec, b.embedding AS b_vec
      FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT a_id, b_id,
           CAST(round(({dot}) / ({nrm_a} * {nrm_b}) * 1e6) AS BIGINT) AS cos_ppm
    FROM pairs
    WHERE CAST(round(({dot}) / ({nrm_a} * {nrm_b}) * 1e6) AS BIGINT)
          >= {int(EP_THRESHOLD * 1e6)}
    """


# --------------------------------------------------------------------------
# q_media_codecs — REAL codecs (PNM + WAV) end to end: blobs synthesized
# from closed forms, decoded by the actual parsers, stats oracle-checked
# against the generating formula (no decoding needed on the oracle side)
# --------------------------------------------------------------------------

def q_media_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.media import media_stats, synth_blob_udf

    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("_id"),
        F.col("doc_id").cast("string").alias("doc_id"))
    blobs = docs.withColumn("blob", synth_blob_udf()("_id")) \
        .select("doc_id", "blob")
    stats = media_stats(blobs)
    return stats.select(
        "doc_id", "kind", "n_raw",
        F.round(F.col("mean_sig") * 1e6).cast("bigint").alias("mean_um"),
        F.round(F.col("lo_sig") * 1e6).cast("bigint").alias("lo_um"),
        F.round(F.col("hi_sig") * 1e6).cast("bigint").alias("hi_um"),
    )


_ORACLE_MEDIA_CODECS = """
WITH px AS (SELECT doc_id, CAST((doc_id * 31 + i * 7) % 251 AS DOUBLE) / 255.0 AS v
            FROM documents, range(64) t(i) WHERE doc_id % 2 = 0),
wv AS (SELECT doc_id, CAST((doc_id * 13 + i * 3) % 2003 - 1001 AS DOUBLE) / 32768.0 AS v
       FROM documents, range(32) t(i) WHERE doc_id % 2 = 1),
u AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'image' AS kind, CAST(64 AS INT) AS n_raw,
         avg(v) AS m, min(v) AS l, max(v) AS h FROM px GROUP BY doc_id
  UNION ALL
  SELECT CAST(doc_id AS VARCHAR), 'audio', CAST(32 AS INT),
         avg(v), min(v), max(v) FROM wv GROUP BY doc_id)
SELECT doc_id, kind, n_raw,
       CAST(round(m * 1e6) AS BIGINT) AS mean_um,
       CAST(round(l * 1e6) AS BIGINT) AS lo_um,
       CAST(round(h * 1e6) AS BIGINT) AS hi_um
FROM u
"""


# --------------------------------------------------------------------------
# q_geodesic_area — A2: geodesic polygon area per class; the Spark side is
# the numpy-kernel pandas UDF (class_polygon_areas), the oracle an
# independent closed-form spherical-excess SQL — a true two-implementation
# triangulation, not a shared formula
# --------------------------------------------------------------------------

def _lonlat_diamond_sql(key: str) -> tuple[str, str, str]:
    lon_c = f"(-150.0 + ((CAST({key} AS BIGINT) * 7919) % 3000) / 10.0)"
    lat_c = f"(-60.0 + ((CAST({key} AS BIGINT) * 104729) % 1200) / 10.0)"
    r = f"(2.0 + (CAST({key} AS BIGINT) % 5))"
    return lon_c, lat_c, r


def q_geodesic_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    lon_c, lat_c, r = _lonlat_diamond_sql("n_nationkey")
    polys = load(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") % 2).cast("int").alias("class"),
        F.expr(
            f"array(named_struct('x', {lon_c} + {r}, 'y', {lat_c}),"
            f" named_struct('x', {lon_c}, 'y', {lat_c} + {r}),"
            f" named_struct('x', {lon_c} - {r}, 'y', {lat_c}),"
            f" named_struct('x', {lon_c}, 'y', {lat_c} - {r}))"
        ).alias("ring"),
    )
    out = metrics.class_polygon_areas(polys, class_col="class")
    return out.select(
        "class",
        F.round(F.col("area_m2") / 1e6).cast("bigint").alias("area_km2"))


def _oracle_geodesic_area() -> str:
    from .functions import geodesy_sql

    lon_c, lat_c, r = _lonlat_diamond_sql("n_nationkey")
    verts = [(f"{lon_c} + {r}", lat_c), (lon_c, f"{lat_c} + {r}"),
             (f"{lon_c} - {r}", lat_c), (lon_c, f"{lat_c} - {r}")]
    inner = "SELECT CAST(n_nationkey % 2 AS INT) AS class, n_nationkey FROM nation"
    for name, expr in geodesy_sql.polygon_area_steps(verts):
        inner = f"SELECT *, {expr} AS {name} FROM ({inner})"
    return f"""
    SELECT class, CAST(round(sum(area_m2) / 1e6) AS BIGINT) AS area_km2
    FROM ({inner}) GROUP BY class
    """


QUERIES3: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "extent": q_extent,
    "nodata_stride": q_nodata_stride,
    "rescale_modes": q_rescale_modes,
    "subarea": q_subarea,
    "line_error": q_line_error,
    "cells_io": q_cells_io,
    "merge_resume": q_merge_resume,
    "resample_bilinear": q_resample_bilinear,
    "resample_cubic": q_resample_cubic,
    "all_touched": q_all_touched,
    "area_error": q_area_error,
    "ann_topk": q_ann_topk,
    "embed_pairs": q_embed_pairs,
    "media_codecs": q_media_codecs,
    "geodesic_area": q_geodesic_area,
}

ORACLES3: dict[str, str] = {
    "extent": _oracle_extent(),
    "nodata_stride": _oracle_nodata_stride(),
    "rescale_modes": _oracle_rescale_modes(),
    "subarea": _oracle_subarea(),
    "line_error": _oracle_line_error(),
    "cells_io": _oracle_cells_io(),
    "merge_resume": _oracle_merge_resume(),
    "resample_bilinear": _oracle_resample_bilinear(),
    "resample_cubic": _oracle_resample_cubic(),
    "all_touched": _oracle_all_touched(),
    "area_error": _oracle_area_error(),
    "ann_topk": _oracle_ann_topk(),
    "embed_pairs": _oracle_embed_pairs(),
    "media_codecs": _ORACLE_MEDIA_CODECS,
    "geodesic_area": _oracle_geodesic_area(),
}
