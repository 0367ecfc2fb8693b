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


def test_cubic_constant_and_interpolating(spark):
    from dggstools_spark.operators.resample import resample_cubic

    src = spark.createDataFrame([(f"Q{i}", 7.0) for i in range(9)],
                                "cellid string, band1 double")
    out = resample_cubic(src, 1, 3).collect()
    assert len(out) == 9 * 81
    assert all(abs(r.band1 - 7.0) < 1e-12 for r in out)


def test_cubic_reproduces_quadratic_field(spark):
    """Keys' a=-0.5 kernel reproduces polynomials up to degree 2 exactly
    (third-order accuracy) over the interior."""
    from dggstools_spark.operators.resample import resample_cubic

    g = grid(spark, 2, faces="Q")
    s = HALF_SIDE
    src = g.select("cellid", (
        (F.col("x") / s) * 3.0 + (F.col("y") / s) * (F.col("y") / s) * 5.0
        + (F.col("x") / s) * (F.col("y") / s) * 2.0 + 1.0).alias("band1"))
    out = resample_cubic(src, 2, 4)
    pdf = out.toPandas()
    cx, cy = cellid_to_planar_centroid(pdf["cellid"].tolist())
    want = (cx / s) * 3.0 + (cy / s) ** 2 * 5.0 + (cx / s) * (cy / s) * 2.0 + 1.0
    got = pdf["band1"].to_numpy()
    w1 = HALF_SIDE / 9
    # cubic stencil reaches 2 source cells out: shrink the interior by 2w
    interior = ((cx > 2 * w1) & (cx < HALF_SIDE - 2 * w1)
                & (cy < HALF_SIDE / 2 - 2 * w1) & (cy > -HALF_SIDE / 2 + 2 * w1))
    assert interior.sum() > 100
    np.testing.assert_allclose(got[interior], want[interior], rtol=1e-9)


def test_cubic_hits_source_samples(spark):
    """Targets whose centroid coincides with a source centroid (col % 3 == 1
    at ratio 3) take exactly the source value — the interpolating property."""
    from dggstools_spark.operators.resample import resample_cubic
    from dggstools_spark.operators.raster import cells_to_tiles

    rng = np.random.default_rng(4)
    g = grid(spark, 2, faces="Q")
    vals = {r.cellid: float(v) for r, v in
            zip(g.select("cellid").collect(), rng.uniform(0, 100, 81))}
    src = spark.createDataFrame(list(vals.items()), "cellid string, band1 double")
    out = resample_cubic(src, 2, 3)
    rc = cells_to_tiles(out, value_cols=["band1"], res=3)
    hits = rc.filter((F.col("row") % 3 == 1) & (F.col("col") % 3 == 1)).collect()
    assert len(hits) == 81
    for r in hits:
        parent = r.cellid[:-1]
        assert abs(r.band1 - vals[parent]) < 1e-9, (r.cellid, r.band1, vals[parent])


def test_area_error_exact_on_aligned_squares(spark):
    """area_error (the reference's vec-ras-area-error composition,
    vector_to_rhpx.py:388-501): squares aligned to exact 3x3 and 2x2 cell
    blocks -> planar vector area == planar raster area per class, so with
    distortion correction off rmse == bias == 0 and the totals are
    (9 + 4) * w^2; with correction on, the diff per class is
    n * w^2 * (1/1.178 - 1) and rmse/bias follow the reference formula."""
    from dggstools_spark.dggs.config import DEFAULT_CONFIG, MEAN_AREAL_DISTORTION
    from dggstools_spark.operators.metrics import area_error

    w = HALF_SIDE / 9
    y_top = HALF_SIDE / 2

    def square(x0_cells, y0_cells, n_cells):
        x0, x1 = x0_cells * w, (x0_cells + n_cells) * w
        y1, y0 = y_top - y0_cells * w, y_top - (y0_cells + n_cells) * w
        return [{"x": x0, "y": y0}, {"x": x1, "y": y0},
                {"x": x1, "y": y1}, {"x": x0, "y": y1}]

    polys = spark.createDataFrame(
        [(1, 0, square(1, 2, 3)), (2, 1, square(5, 4, 2))],
        "poly_id int, class int, ring array<struct<x double, y double>>")
    flat = area_error(polys, 2, class_col="class",
                      distortion_correct=False).collect()[0]
    # ~1e-16 relative float residue on ~1e13 m^2 areas
    assert abs(flat.rmse) < 0.1 and abs(flat.bias) < 0.1
    np.testing.assert_allclose(flat.total_vector_area, 13 * w * w, rtol=1e-12)
    np.testing.assert_allclose(flat.total_cells_area, 13 * w * w, rtol=1e-12)

    corr = area_error(polys, 2, class_col="class").collect()[0]
    d1 = 9 * w * w / MEAN_AREAL_DISTORTION - 9 * w * w
    d2 = 4 * w * w / MEAN_AREAL_DISTORTION - 4 * w * w
    np.testing.assert_allclose(corr.rmse, np.sqrt((d1**2 + d2**2) / 2), rtol=1e-9)
    np.testing.assert_allclose(corr.bias, (d1 + d2) / 2, rtol=1e-9)


def test_resample_area_integer_scale_equals_parent_rollup(spark):
    """scale = n_side^levels with zero offset reproduces the exact avg
    parent rollup (same cells, same values)."""
    from dggstools_spark.functions import encode_sql
    from dggstools_spark.operators.raster import cells_to_tiles, rescale_to_parent
    from dggstools_spark.operators.resample import resample_area

    src = spark.createDataFrame(
        [(r, c, float((r * 7 + c * 13) % 23)) for r in range(9) for c in range(9)],
        "row long, col long, band1 double").select(
        F.expr(encode_sql.rowcol_cellid_sql("'Q'", "row", "col", 2)).alias("cellid"),
        "band1")
    area = resample_area(src, 2, 3.0)  # one level: 3x3 children per parent
    rolled = rescale_to_parent(src, 1, agg="avg")
    rolled_rc = cells_to_tiles(rolled, res=1).select(
        "face", F.col("row").alias("trow"), F.col("col").alias("tcol"), "band1")
    a = {(r.face, r.trow, r.tcol): r.band1 for r in area.collect()}
    b = {(r.face, r.trow, r.tcol): r.band1 for r in rolled_rc.collect()}
    assert set(a) == set(b)
    for k in a:
        assert abs(a[k] - b[k]) < 1e-12
    assert all(abs(r.coverage - 1.0) < 1e-12 for r in area.collect())


def test_resample_area_fractional_constant_field(spark):
    """Piecewise-constant field: every covered target cell gets exactly the
    constant; interior coverage is 1, border cells fractional."""
    from dggstools_spark.functions import encode_sql
    from dggstools_spark.operators.resample import resample_area

    src = spark.createDataFrame(
        [(r, c, 5.0) for r in range(6) for c in range(6)],
        "row long, col long, band1 double").select(
        F.expr(encode_sql.rowcol_cellid_sql("'Q'", "row", "col", 2)).alias("cellid"),
        "band1")
    out = resample_area(src, 2, 2.5, offset_x=0.25, offset_y=0.25).collect()
    assert out and all(abs(r.band1 - 5.0) < 1e-12 for r in out)
    # total weight conserves total source area (36 cells)
    assert abs(sum(r.coverage * 6.25 for r in out) - 36.0) < 1e-9
    assert any(r.coverage < 1.0 - 1e-9 for r in out)       # borders
    assert any(abs(r.coverage - 1.0) < 1e-12 for r in out)  # interior


def test_resample_area_matches_numpy_reference(spark):
    """Randomized scales/offsets: resample_area equals a direct numpy
    overlap-integration reference (weights, normalization, coverage)."""
    import random

    import numpy as np

    from dggstools_spark.functions import encode_sql
    from dggstools_spark.operators.resample import resample_area

    random.seed(17)
    for trial in range(3):
        n = random.randint(4, 7)
        vals = {(r, c): float((r * 13 + c * 7 + trial) % 19)
                for r in range(n) for c in range(n)}
        src = spark.createDataFrame(
            [(r, c, v) for (r, c), v in vals.items()],
            "row long, col long, band1 double").select(
            F.expr(encode_sql.rowcol_cellid_sql("'Q'", "row", "col", 2)).alias("cellid"),
            "band1")
        sx = random.uniform(0.7, 4.3)
        sy = random.uniform(0.7, 4.3)
        ox = random.uniform(-1.0, 1.0)
        oy = random.uniform(-1.0, 1.0)
        got = {(r.trow, r.tcol): (r.band1, r.coverage)
               for r in resample_area(src, 2, sx, sy, ox, oy).collect()}

        # numpy reference: integrate each source cell's overlap into targets
        acc: dict = {}
        for (r, c), v in vals.items():
            t_lo_x = int(np.floor((c - ox) / sx)) - 1
            t_hi_x = int(np.floor((c + 1 - ox) / sx)) + 1
            t_lo_y = int(np.floor((r - oy) / sy)) - 1
            t_hi_y = int(np.floor((r + 1 - oy) / sy)) + 1
            for tc in range(t_lo_x, t_hi_x + 1):
                wx = min(ox + (tc + 1) * sx, c + 1) - max(ox + tc * sx, c)
                if wx <= 0:
                    continue
                for tr in range(t_lo_y, t_hi_y + 1):
                    wy = min(oy + (tr + 1) * sy, r + 1) - max(oy + tr * sy, r)
                    if wy <= 0:
                        continue
                    w = wx * wy
                    sw, swv = acc.get((tr, tc), (0.0, 0.0))
                    acc[(tr, tc)] = (sw + w, swv + w * v)
        exp = {k: (swv / sw, sw / (sx * sy)) for k, (sw, swv) in acc.items()}
        assert set(got) == set(exp), f"key sets differ (trial {trial})"
        for k in exp:
            assert abs(got[k][0] - exp[k][0]) < 1e-9, f"value {k} trial {trial}"
            assert abs(got[k][1] - exp[k][1]) < 1e-9, f"coverage {k} trial {trial}"
