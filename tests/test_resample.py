"""R1 bilinear resample + J2 all_touched tests."""

import numpy as np
from pyspark.sql import functions as F

from dggstools_spark.dggs.cells import HALF_SIDE, cellid_to_planar_centroid
from dggstools_spark.operators import spatial_join
from dggstools_spark.operators.resample import resample_bilinear
from dggstools_spark.operators.raster import grid


def test_bilinear_constant_field(spark):
    src = spark.createDataFrame([(f"Q{i}", 7.0) for i in range(9)],
                                "cellid string, band1 double")
    out = resample_bilinear(src, 1, 3)
    rows = out.collect()
    assert len(rows) == 9 * 81
    assert all(abs(r.band1 - 7.0) < 1e-12 for r in rows)


def test_bilinear_reproduces_linear_field(spark):
    # source = res-2 grid on face Q with value a*x + b*y of the centroid;
    # bilinear interpolation is exact for linear fields in the interior
    g = grid(spark, 2, faces="Q")
    a, b = 3e-6, -2e-6
    src = g.select("cellid", (F.col("x") * a + F.col("y") * b).alias("band1"))
    out = resample_bilinear(src, 2, 4)
    pdf = out.toPandas()
    cx, cy = cellid_to_planar_centroid(pdf["cellid"].tolist())
    want = a * cx + b * cy
    got = pdf["band1"].to_numpy()
    # interior cells exact; border cells extrapolate from fewer neighbors
    w1 = HALF_SIDE / 9  # source cell width
    interior = ((cx > w1) & (cx < HALF_SIDE - w1)
                & (cy < HALF_SIDE / 2 - w1) & (cy > -HALF_SIDE / 2 + w1))
    assert interior.sum() > 100
    np.testing.assert_allclose(got[interior], want[interior], rtol=1e-9)


def test_all_touched_superset_and_sliver(spark):
    # thin horizontal sliver crossing three res-2 cells without containing
    # any center: center-burn finds nothing, all_touched finds the row
    w = HALF_SIDE / 9
    y_edge = HALF_SIDE / 2 - w  # boundary between cell rows 0 and 1 on face Q
    ring = [{"x": 0.5 * w, "y": y_edge - 0.05 * w},
            {"x": 2.5 * w, "y": y_edge - 0.05 * w},
            {"x": 2.5 * w, "y": y_edge + 0.05 * w},
            {"x": 0.5 * w, "y": y_edge + 0.05 * w}]
    polys = spark.createDataFrame([(1, ring)],
                                  "poly_id int, ring array<struct<x double, y double>>")
    center = spatial_join.rasterize_polygons(polys, 2)
    touched = spatial_join.rasterize_polygons(polys, 2, all_touched=True)
    c_ids = {r.cellid for r in center.collect()}
    t_ids = {r.cellid for r in touched.collect()}
    assert c_ids == set()  # sliver contains no cell centers
    # straddles the row-0/row-1 boundary across columns 0..2
    assert t_ids == {"Q00", "Q01", "Q02", "Q03", "Q04", "Q05"}


def test_all_touched_contains_center_burn(spark):
    w = HALF_SIDE / 9
    ring = [{"x": 0.6 * w, "y": HALF_SIDE / 2 - 3.7 * w},
            {"x": 4.2 * w, "y": HALF_SIDE / 2 - 3.9 * w},
            {"x": 3.1 * w, "y": HALF_SIDE / 2 - 0.6 * w}]
    polys = spark.createDataFrame([(1, ring)],
                                  "poly_id int, ring array<struct<x double, y double>>")
    c_ids = {r.cellid for r in spatial_join.rasterize_polygons(polys, 2).collect()}
    t_ids = {r.cellid for r in
             spatial_join.rasterize_polygons(polys, 2, all_touched=True).collect()}
    assert c_ids and c_ids <= t_ids and len(t_ids) > len(c_ids)
