"""CLI surface parity with the reference (`python -m dggstools_spark`).

The reference ships a Typer CLI with 7 commands (reference
dggstools/__main__.py:34-229); this argparse twin maps each onto the
distributed operators, with Spark-native IO: vector/raster datasets are
parquet tables (polygon table: poly_id [, class], ring array<struct<x,y>>;
long-form raster: face, row, col, band*), cell tables are the
prefix-partitioned parquet + _meta.json sidecar layout of sources/cells_io.

| reference command         | here                                         |
|---------------------------|----------------------------------------------|
| vec-to-rhpx-ras           | rasterize polygons -> cell table              |
| ras-to-rhpx-ras           | long-form raster -> cell table (+resample)    |
| ras-rhpx-to-vec-rhpx      | cell table -> geodetic polygon parquet        |
| vec-rhpx-to-ras-rhpx      | cellid vector parquet -> cell table           |
| vec-ras-area-error        | per-class area rmse/bias/totals               |
| print-vec-rhpx-metadata   | sidecar attrs as JSON                         |
| print-ras-rhpx-metadata   | sidecar attrs as JSON                         |
| rhealpix-to-geopackage    | cell table -> GeoPackage (gpkg_metadata attrs) |
| geopackage-to-rhealpix    | GeoPackage -> cell table (+_meta sidecar)     |

The rdggs spec string "n_side/north_square/south_square" (default "3/1/0")
matches the reference's serialization (__main__.py:21-32).
"""

from __future__ import annotations

import argparse
import json

import pandas as pd  # module-level: pandas-UDF type hints resolve here
                     # under `from __future__ import annotations`

from .dggs.config import RHEALPixConfig


def parse_rdggs(spec: str) -> RHEALPixConfig:
    n, ns, ss = (int(p) for p in spec.split("/"))
    return RHEALPixConfig(n_side=n, north_square=ns, south_square=ss)


def _spark(app: str):
    from .session import get_spark

    return get_spark(app)


def cmd_vec_to_rhpx_ras(a) -> None:
    from pyspark.sql import functions as F

    from .operators.spatial_join import rasterize_polygons
    from .sources import cells_io

    spark = _spark("vec-to-rhpx-ras")
    cfg = parse_rdggs(a.rdggs)
    polys = spark.read.parquet(a.input)
    cells = rasterize_polygons(polys.select("poly_id", "ring"), a.res,
                               cfg=cfg, all_touched=a.all_touched)
    if a.class_col and a.class_col in polys.columns:
        cls = polys.select("poly_id", F.col(a.class_col).alias("band1"))
        cells = cells.join(F.broadcast(cls), "poly_id")
    else:
        cells = cells.withColumn("band1", F.lit(float(a.fixed_value)))
    out = cells.select("cellid", F.col("band1").cast("double"))
    attrs = cells_io.build_attrs(a.res, 1, None, cfg,
                                 extra={"input": a.input, "kind": "vector-burn"})
    cells_io.write_cells(out, a.output, attrs)
    print(f"wrote {a.output}")


def cmd_ras_to_rhpx_ras(a) -> None:
    from .operators.raster import tiles_to_cells
    from .operators.resample import resample_bilinear, resample_cubic
    from .sources import cells_io

    spark = _spark("ras-to-rhpx-ras")
    cfg = parse_rdggs(a.rdggs)
    tiles = spark.read.parquet(a.input)
    cells = tiles_to_cells(tiles, a.res, nodata=a.nodata, cfg=cfg)
    res = a.res
    if a.dst_res is not None and a.dst_res != a.res:
        if a.dst_res < a.res and a.resampling in ("bilinear", "cubic"):
            raise SystemExit(
                "bilinear/cubic target an equal-or-finer --dst-res; for"
                " coarsening use --resampling nearest (first-child) or roll"
                " up with operators.raster.rescale_to_parent(agg='avg')")
        if a.resampling == "bilinear":
            cells = resample_bilinear(cells, a.res, a.dst_res, cfg=cfg)
        elif a.resampling == "cubic":
            cells = resample_cubic(cells, a.res, a.dst_res, cfg=cfg)
        else:  # nearest
            from .operators.raster import (explode_to_children,
                                           rescale_to_parent)

            if a.dst_res > a.res:
                cells = explode_to_children(cells.select("cellid", "band1"),
                                            a.dst_res - a.res, cfg.n_side)
            else:
                cells = rescale_to_parent(cells.select("cellid", "band1"),
                                          a.res - a.dst_res, agg="first")
        res = a.dst_res
    attrs = cells_io.build_attrs(res, 1, a.nodata, cfg,
                                 extra={"input": a.input, "kind": "raster"})
    cells_io.write_cells(cells.select("cellid", "band1"), a.output, attrs)
    print(f"wrote {a.output}")


def cmd_ras_rhpx_to_vec_rhpx(a) -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.types import (ArrayType, DoubleType, StructField,
                                   StructType)

    from .sources import cells_io

    spark = _spark("ras-rhpx-to-vec-rhpx")
    cells, attrs = cells_io.read_cells(spark, a.input)
    # like the reference, the DGGS comes from the dataset's own metadata;
    # --rdggs is only the fallback for tables without a sidecar
    rd = attrs.get("rhealpixdggs")
    cfg = (RHEALPixConfig(n_side=rd["n_side"], north_square=rd["north_square"],
                          south_square=rd["south_square"])
           if rd else parse_rdggs(a.rdggs))
    ring_t = ArrayType(StructType([StructField("x", DoubleType()),
                                   StructField("y", DoubleType())]))

    @F.pandas_udf(ring_t)
    def _rings(cellids: pd.Series) -> pd.Series:
        from .dggs.cells import cellid_to_geodetic_vertices

        rings = cellid_to_geodetic_vertices(cellids.tolist(), cfg)
        return pd.Series([[{"x": float(lo), "y": float(la)} for lo, la in r]
                          for r in rings])

    out = cells.withColumn("ring", _rings("cellid"))
    out.write.mode("overwrite").parquet(a.output)
    print(f"wrote {a.output} (geodetic rings, EPSG:4326)")


def cmd_vec_rhpx_to_ras_rhpx(a) -> None:
    from .sources import cells_io

    spark = _spark("vec-rhpx-to-ras-rhpx")
    cfg = parse_rdggs(a.rdggs)
    vec = spark.read.parquet(a.input)
    cells = vec.drop("ring")
    sample = cells.select("cellid").first()
    if sample is None:
        raise SystemExit(f"{a.input} holds no cells — nothing to rasterize")
    res = len(sample[0]) - 1
    attrs = cells_io.build_attrs(res, 1, None, cfg,
                                 extra={"input": a.input, "kind": "vector-cells"})
    cells_io.write_cells(cells, a.output, attrs)
    print(f"wrote {a.output}")


def cmd_vec_ras_area_error(a) -> None:
    from pyspark.sql import functions as F

    from .operators.metrics import area_error

    spark = _spark("vec-ras-area-error")
    cfg = parse_rdggs(a.rdggs)
    polys = spark.read.parquet(a.vector)
    cls = a.class_col if a.class_col in polys.columns else None
    if cls is None:
        polys = polys.withColumn("_cls", F.lit(a.fixed_value))
        cls = "_cls"
    row = area_error(polys, a.res, class_col=cls, cfg=cfg).collect()[0]
    print(json.dumps({"rmse": row.rmse, "bias": row.bias,
                      "total_vector_area": row.total_vector_area,
                      "total_cells_area": row.total_cells_area}))


def cmd_print_metadata(a) -> None:
    from .sources import cells_io

    print(json.dumps(cells_io.read_attrs(a.input), indent=2))


def cmd_rhpx_to_geopackage(a) -> None:
    """reference CLI rhealpix-to-geopackage (utils/storage.py:71-83)."""
    from .sources import cells_io, geopackage

    spark = _spark("rhpx-to-gpkg")
    cells, attrs = cells_io.read_cells(spark, a.input)
    if a.values_in_json:
        cells = cells_io.with_json_bands(cells)
    if a.add_uid:
        cells = cells_io.with_uuid(cells)
    n = geopackage.write_cells_geopackage(cells, a.output, attrs,
                                          layer=a.layer, geometry=a.geometry)
    print(json.dumps({"features": n, "output": a.output}))


def cmd_geopackage_to_rhpx(a) -> None:
    """reference CLI geopackage-to-rhealpix (utils/storage.py:86-99)."""
    from .sources import cells_io, geopackage

    spark = _spark("gpkg-to-rhpx")
    cells, attrs = geopackage.read_cells_geopackage(spark, a.input,
                                                    layer=a.layer)
    cells_io.write_cells(cells, a.output, attrs)
    print(json.dumps({"cells": cells.count(), "output": a.output}))


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="dggstools_spark",
                                 description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--rdggs", default="3/1/0",
                       help="n_side/north_square/south_square")

    p = sub.add_parser("vec-to-rhpx-ras", help="rasterize a polygon table")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--res", type=int, required=True)
    p.add_argument("--class-col", default="class")
    p.add_argument("--fixed-value", type=float, default=1.0)
    p.add_argument("--all-touched", action="store_true")
    common(p)
    p.set_defaults(fn=cmd_vec_to_rhpx_ras)

    p = sub.add_parser("ras-to-rhpx-ras", help="long-form raster -> cell table")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--res", type=int, required=True)
    p.add_argument("--dst-res", type=int, default=None)
    p.add_argument("--resampling", default="nearest",
                   choices=["nearest", "bilinear", "cubic"])
    p.add_argument("--nodata", type=float, default=None)
    common(p)
    p.set_defaults(fn=cmd_ras_to_rhpx_ras)

    p = sub.add_parser("ras-rhpx-to-vec-rhpx",
                       help="cell table -> geodetic polygon parquet")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    common(p)
    p.set_defaults(fn=cmd_ras_rhpx_to_vec_rhpx)

    p = sub.add_parser("vec-rhpx-to-ras-rhpx",
                       help="cellid vector parquet -> cell table")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    common(p)
    p.set_defaults(fn=cmd_vec_rhpx_to_ras_rhpx)

    p = sub.add_parser("vec-ras-area-error",
                       help="per-class vector-vs-raster area rmse/bias")
    p.add_argument("--vector", required=True)
    p.add_argument("--res", type=int, required=True)
    p.add_argument("--class-col", default="class")
    p.add_argument("--fixed-value", type=float, default=1.0)
    common(p)
    p.set_defaults(fn=cmd_vec_ras_area_error)

    p = sub.add_parser("rhealpix-to-geopackage",
                       help="cell table -> GeoPackage (attrs in gpkg_metadata)")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--layer", default="data")
    p.add_argument("--add-uid", action="store_true")
    p.add_argument("--values-in-json", action="store_true")
    p.add_argument("--geometry", choices=["point", "polygon"], default="point")
    p.set_defaults(fn=cmd_rhpx_to_geopackage)

    p = sub.add_parser("geopackage-to-rhealpix",
                       help="GeoPackage -> cell table (+_meta sidecar)")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--layer", default="data")
    p.set_defaults(fn=cmd_geopackage_to_rhpx)

    for name in ("print-vec-rhpx-metadata", "print-ras-rhpx-metadata"):
        p = sub.add_parser(name, help="print the _meta.json attrs")
        p.add_argument("--input", required=True)
        p.set_defaults(fn=cmd_print_metadata)
    return ap


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
