"""Cell-table storage (SURVEY S3/S4/S6/S10 analogues).

Layout: parquet partitioned by cell prefix (the Iceberg truncate-transform
layout), so cell-keyed joins and rollups prune partitions, plus a JSON
``_meta`` sidecar carrying the reference's gdf.attrs contract
(/root/reference/dggstools/rhpx/rhpx_gdf_helper.py:149-186 and
utils/storage.py:51-66 gpkg_metadata)."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..dggs.config import RHEALPixConfig, DEFAULT_CONFIG


def build_attrs(res_idx: int, nbands: int, nodata: float | None,
                cfg: RHEALPixConfig = DEFAULT_CONFIG,
                extra: dict | None = None) -> dict:
    attrs = {
        "res_idx": res_idx,
        "res": cfg.cell_width(res_idx),
        "nbands": nbands,
        "nodata": nodata,
        "nodatavals": [nodata] * nbands,
        "store_nodata": nodata is None,
        "rhealpixdggs": {
            "n_side": cfg.n_side,
            "north_square": cfg.north_square,
            "south_square": cfg.south_square,
            "max_resolution": cfg.max_resolution,
            "ellipsoid": "WGS84",
        },
    }
    attrs.update(extra or {})
    return attrs


def write_cells(df: DataFrame, path: str, attrs: dict,
                cellid_col: str = "cellid", prefix_len: int = 2,
                mode: str = "overwrite") -> None:
    """Write a cell table partitioned by cellid prefix + _meta sidecar."""
    out = df.withColumn("cell_prefix", F.substring(cellid_col, 1, prefix_len))
    out.write.mode(mode).partitionBy("cell_prefix").parquet(f"{path}/data")
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/_meta.json", "w") as f:
        json.dump({"attrs": attrs, "prefix_len": prefix_len}, f, indent=2)


def read_cells(spark: SparkSession, path: str,
               prefix: str | None = None,
               cellid_col: str = "cellid") -> tuple[DataFrame, dict]:
    """Read a cell table (+attrs).  ``prefix`` prunes partitions; a prefix
    FINER than the stored partition prefix_len additionally row-filters on
    the cellid (a bare startswith on the partition column would silently
    return nothing: 'N1'.startswith('N12') is false for every partition)."""
    df = spark.read.parquet(f"{path}/data")
    with open(f"{path}/_meta.json") as f:
        meta = json.load(f)
    if prefix:
        plen = int(meta.get("prefix_len", 2))
        if len(prefix) <= plen:
            df = df.filter(F.col("cell_prefix").startswith(prefix))
        else:
            df = df.filter((F.col("cell_prefix") == prefix[:plen])
                           & F.col(cellid_col).startswith(prefix))
    return df.drop("cell_prefix"), meta["attrs"]


def read_attrs(path: str) -> dict:
    """S10 metadata reader (print-*-metadata CLI analogue)."""
    with open(f"{path}/_meta.json") as f:
        return json.load(f)["attrs"]
