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


def resample_bilinear(src: DataFrame, res_src: int, res_dst: int,
                      value_col: str = "band1",
                      cellid_col: str = "cellid",
                      cfg: RHEALPixConfig = DEFAULT_CONFIG) -> DataFrame:
    """Source cell table at ``res_src`` -> values bilinearly interpolated at
    every ``res_dst`` descendant of the source coverage.

    Exact for linear fields over the face interior (tests assert this)."""
    if res_dst < res_src:
        raise ValueError("bilinear resample targets an equal or finer resolution")
    n = cfg.n_side
    ratio = n ** (res_dst - res_src)

    src_rc = cells_to_tiles(src.select(cellid_col, value_col), cellid_col,
                            value_cols=[value_col], tile_prefix_len=1,
                            res=res_src, cfg=cfg) \
        .select("face", F.col("row").alias("srow"), F.col("col").alias("scol"),
                F.col(value_col).alias("_v"))

    # target grid = all res_dst descendants of the source cells
    tgt = src.select(cellid_col)
    k = n * n
    for _ in range(res_dst - res_src):
        tgt = tgt.withColumn(
            cellid_col,
            F.explode(F.expr(
                f"transform(sequence(0, {k - 1}), d -> concat({cellid_col}, CAST(d AS STRING)))")),
        )
    tgt_rc = cells_to_tiles(tgt, cellid_col, value_cols=[], tile_prefix_len=1,
                            res=res_dst, cfg=cfg)

    # target centroid in source lattice units: u = (col + .5)/ratio - .5
    tgt_rc = tgt_rc.select(
        cellid_col, "face",
        ((F.col("col") + 0.5) / ratio - 0.5).alias("u"),
        ((F.col("row") + 0.5) / ratio - 0.5).alias("v"),
    ).withColumn("i0", F.floor("u").cast("bigint")) \
     .withColumn("j0", F.floor("v").cast("bigint")) \
     .withColumn("fu", F.col("u") - F.col("i0")) \
     .withColumn("fv", F.col("v") - F.col("j0"))

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
