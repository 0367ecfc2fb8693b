"""R1: raster resampling between resolutions (reference raster_to_rhpx.py
rasterio.warp.reproject with Resampling.nearest/bilinear — here re-expressed
as relational neighbor-gather on the cell lattice).

- nearest: downscale = raster.rescale_to_parent(agg='first'); upscale =
  raster.explode_to_children (both in operators/raster.py).
- bilinear (this module): for each target cell, interpolate from the 4
  surrounding source-cell centroids on the same face: explode 4 corner keys,
  equi-join the source on (face, row, col), weighted-sum per target.
  Face-local by design: cells within half a source cell of a face edge
  renormalize over the neighbors that exist (documented deviation from GDAL,
  which warps across the cap seams)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..dggs.config import RHEALPixConfig, DEFAULT_CONFIG
from .raster import cells_to_tiles



def _src_rc(src, res_src: int, value_col: str, cellid_col: str,
            cfg: RHEALPixConfig):
    """Source cells -> (face, srow, scol, _v) lattice rows (shared by the
    bilinear and cubic gathers)."""
    return cells_to_tiles(src.select(cellid_col, value_col), cellid_col,
                          value_cols=[value_col], tile_prefix_len=1,
                          res=res_src, cfg=cfg) \
        .select("face", F.col("row").alias("srow"), F.col("col").alias("scol"),
                F.col(value_col).alias("_v"))


def _tgt_fractions(src, res_src: int, res_dst: int, cellid_col: str,
                   cfg: RHEALPixConfig):
    """All res_dst descendants of the source cells with their position in
    SOURCE lattice units: u/v = (col|row + .5)/ratio - .5, plus the integer
    base (i0, j0) and fractions (fu, fv) — shared by both interpolators."""
    from .raster import explode_to_children

    ratio = cfg.n_side ** (res_dst - res_src)
    tgt = explode_to_children(src.select(cellid_col), res_dst - res_src,
                              cfg.n_side, cellid_col)
    tgt_rc = cells_to_tiles(tgt, cellid_col, value_cols=[], tile_prefix_len=1,
                            res=res_dst, cfg=cfg)
    return tgt_rc.select(
        cellid_col, "face",
        ((F.col("col") + 0.5) / ratio - 0.5).alias("u"),
        ((F.col("row") + 0.5) / ratio - 0.5).alias("v"),
    ).withColumn("i0", F.floor("u").cast("bigint")) \
     .withColumn("j0", F.floor("v").cast("bigint")) \
     .withColumn("fu", F.col("u") - F.col("i0")) \
     .withColumn("fv", F.col("v") - F.col("j0"))


def resample_bilinear(src: DataFrame, res_src: int, res_dst: int,
                      value_col: str = "band1",
                      cellid_col: str = "cellid",
                      cfg: RHEALPixConfig = DEFAULT_CONFIG) -> DataFrame:
    """Source cell table at ``res_src`` -> values bilinearly interpolated at
    every ``res_dst`` descendant of the source coverage.

    Exact for linear fields over the face interior (tests assert this)."""
    if res_dst < res_src:
        raise ValueError("bilinear resample targets an equal or finer resolution")
    src_rc = _src_rc(src, res_src, value_col, cellid_col, cfg)
    tgt_rc = _tgt_fractions(src, res_src, res_dst, cellid_col, cfg)

    corners = tgt_rc.select(
        cellid_col, "face", "i0", "j0", "fu", "fv",
        F.explode(F.expr(
            "array(named_struct('di', 0, 'dj', 0), named_struct('di', 1, 'dj', 0),"
            " named_struct('di', 0, 'dj', 1), named_struct('di', 1, 'dj', 1))")).alias("c"),
    ).select(
        cellid_col, "face",
        (F.col("i0") + F.col("c.di")).alias("scol"),
        (F.col("j0") + F.col("c.dj")).alias("srow"),
        ((F.when(F.col("c.di") == 1, F.col("fu")).otherwise(1 - F.col("fu")))
         * (F.when(F.col("c.dj") == 1, F.col("fv")).otherwise(1 - F.col("fv")))).alias("w"),
    )

    joined = corners.join(src_rc, ["face", "srow", "scol"], "inner")
    return joined.groupBy(cellid_col).agg(
        (F.sum(F.col("w") * F.col("_v")) / F.sum("w")).alias(value_col))


def resample_area(src: DataFrame, res_src: int,
                  scale_x: float, scale_y: float | None = None,
                  offset_x: float = 0.0, offset_y: float = 0.0,
                  value_col: str = "band1", cellid_col: str = "cellid",
                  cfg: RHEALPixConfig = DEFAULT_CONFIG) -> DataFrame:
    """Anti-aliased (area-weighted average) downscale onto an ARBITRARY
    per-face target grid: target cell (face, trow, tcol) covers the
    source-lattice box [offset + t*scale, offset + (t+1)*scale).  Each
    source cell contributes its fractional overlap area as weight; the
    result is sum(w*v)/sum(w) plus ``coverage`` = sum(w)/(scale_x*scale_y)
    so partial coverage is observable (GDAL ``Resampling.average`` under an
    unaligned warp, reference resampling surface utils/rasterutils.py:
    122-172; for integer scale and zero offset this equals the exact
    parent rollup — property-tested against rescale_to_parent).

    Scale shape: ONE explode of the source table into its covering target
    keys (ceil(scale)+1 per axis at most) and ONE hash aggregation — no
    join at all, cheaper than the bilinear/cubic gather."""
    if scale_y is None:
        scale_y = scale_x
    if scale_x <= 0 or scale_y <= 0:
        raise ValueError("scale must be positive")
    rc = _src_rc(src, res_src, value_col, cellid_col, cfg)

    def axis(s_col: str, scale: float, off: float, t_out: str, w_out: str):
        # generous target-index bounds, then exact-overlap filter; the
        # overlap expression mirrors the oracle SQL op-for-op (least/greatest
        # of identically-computed doubles) for bit-identical weights
        lo = F.floor((F.col(s_col) - F.lit(off)) / F.lit(scale)).cast("bigint") - 1
        hi = F.floor((F.col(s_col) + 1 - F.lit(off)) / F.lit(scale)).cast("bigint") + 1
        t = F.explode(F.sequence(lo, hi)).alias(t_out)
        w = (F.least(F.lit(off) + (F.col(t_out) + 1) * F.lit(scale), F.col(s_col) + 1)
             - F.greatest(F.lit(off) + F.col(t_out) * F.lit(scale), F.col(s_col)))
        return t, w.alias(w_out)

    tc, wx = axis("scol", scale_x, offset_x, "tcol", "_wx")
    out = rc.select("face", "srow", "scol", "_v", tc).select("*", wx) \
            .filter(F.col("_wx") > 0)
    tr, wy = axis("srow", scale_y, offset_y, "trow", "_wy")
    out = out.select("face", "srow", "tcol", "_wx", "_v", tr) \
             .select("*", wy).filter(F.col("_wy") > 0)
    w = F.col("_wx") * F.col("_wy")
    return out.groupBy("face", "trow", "tcol").agg(
        (F.sum(w * F.col("_v")) / F.sum(w)).alias(value_col),
        (F.sum(w) / F.lit(scale_x * scale_y)).alias("coverage"))


def cubic_weights_sql(t: str) -> list[str]:
    """Portable SQL Catmull-Rom (Keys, a=-0.5 — GDAL's 'cubic') weights for
    sample offsets -1, 0, +1, +2 at fractional position ``t`` in [0, 1).
    Shared text between the Spark expression and the DuckDB oracle."""
    t1 = f"({t})"
    t2 = f"({t1} * {t1})"
    t3 = f"({t1} * {t1} * {t1})"
    return [
        f"(-0.5 * {t3} + {t2} - 0.5 * {t1})",
        f"(1.5 * {t3} - 2.5 * {t2} + 1.0)",
        f"(-1.5 * {t3} + 2.0 * {t2} + 0.5 * {t1})",
        f"(0.5 * {t3} - 0.5 * {t2})",
    ]


def resample_cubic(src: DataFrame, res_src: int, res_dst: int,
                   value_col: str = "band1",
                   cellid_col: str = "cellid",
                   cfg: RHEALPixConfig = DEFAULT_CONFIG) -> DataFrame:
    """R1 cubic: 16-corner separable Catmull-Rom gather — the same
    relational shape as bilinear with a 4x4 stencil (reference
    tests_data.py:152-153 exercises Resampling.cubic through GDAL; Keys'
    a=-0.5 kernel is GDAL's convolution).  Exact for quadratic fields over
    the face interior (tests assert this); edge targets renormalize over
    the corners that exist, like bilinear."""
    if res_dst < res_src:
        raise ValueError("cubic resample targets an equal or finer resolution")
    src_rc = _src_rc(src, res_src, value_col, cellid_col, cfg)
    tgt_rc = _tgt_fractions(src, res_src, res_dst, cellid_col, cfg)

    wx = cubic_weights_sql("fu")
    wy = cubic_weights_sql("fv")
    wx_case = "CASE di " + " ".join(f"WHEN {i} THEN {w}" for i, w in enumerate(wx)) + " ELSE 0.0 END"
    wy_case = "CASE dj " + " ".join(f"WHEN {i} THEN {w}" for i, w in enumerate(wy)) + " ELSE 0.0 END"
    corners = (
        tgt_rc
        .withColumn("di", F.explode(F.expr("sequence(0, 3)")))
        .withColumn("dj", F.explode(F.expr("sequence(0, 3)")))
        .select(
            cellid_col, "face",
            (F.col("i0") - 1 + F.col("di")).alias("scol"),
            (F.col("j0") - 1 + F.col("dj")).alias("srow"),
            (F.expr(wx_case) * F.expr(wy_case)).alias("w"),
        )
    )
    joined = corners.join(src_rc, ["face", "srow", "scol"], "inner")
    return joined.groupBy(cellid_col).agg(
        (F.sum(F.col("w") * F.col("_v")) / F.sum("w")).alias(value_col))
