"""Round-6 batch 25: overlay, trip stats, mean center."""

import math

from pyspark.sql import functions as F

from dggstools_spark.dggs.cells import HALF_SIDE
from dggstools_spark.operators.flows import trip_stats
from dggstools_spark.operators.spatial_join import (overlay_counts,
                                                    rasterize_polygons)
from dggstools_spark.operators.spatial_stats import mean_center

_S = float(HALF_SIDE)


def _diamond(cx, cy, rad):
    return [{"x": cx + rad, "y": cy}, {"x": cx, "y": cy + rad},
            {"x": cx - rad, "y": cy}, {"x": cx, "y": cy - rad}]


def test_overlay_identical_and_disjoint(spark):
    # A1 == B1 (identical diamond) -> overlay count equals the polygon's
    # own rasterized cell count; B2 far away -> no (A1, B2) row.
    d1 = _diamond(0.3 * _S, 0.1 * _S, 0.2 * _S)
    d2 = _diamond(-1.5 * _S, -0.1 * _S, 0.15 * _S)
    schema = ("id long, ring array<struct<x: double, y: double>>")
    a = spark.createDataFrame([(1, d1)], schema) \
        .select(F.col("id").alias("a_id"), "ring")
    b = spark.createDataFrame([(1, d1), (2, d2)], schema) \
        .select(F.col("id").alias("b_id"), "ring")
    res = 4
    own = rasterize_polygons(
        a.withColumnRenamed("a_id", "poly_id"), res).count()
    out = {(r.a_id, r.b_id): r for r in
           overlay_counts(a, b, res).collect()}
    assert set(out) == {(1, 1)}
    assert out[(1, 1)].n_cells == own > 0
    # area follows the / 1.178 convention
    from dggstools_spark.dggs.config import DEFAULT_CONFIG
    exp = round(own * DEFAULT_CONFIG.cell_area(res) / 1e6)
    assert out[(1, 1)].area_km2 == exp


def test_overlay_partial(spark):
    # two half-shifted diamonds: intersection strictly smaller than
    # either rasterization, strictly positive
    res = 4
    d1 = _diamond(0.0, 0.0, 0.2 * _S)
    d2 = _diamond(0.1 * _S, 0.0, 0.2 * _S)
    schema = ("id long, ring array<struct<x: double, y: double>>")
    a = spark.createDataFrame([(1, d1)], schema) \
        .select(F.col("id").alias("a_id"), "ring")
    b = spark.createDataFrame([(2, d2)], schema) \
        .select(F.col("id").alias("b_id"), "ring")
    na = rasterize_polygons(
        a.withColumnRenamed("a_id", "poly_id"), res).count()
    nb = rasterize_polygons(
        b.withColumnRenamed("b_id", "poly_id"), res).count()
    row = overlay_counts(a, b, res).collect()[0]
    assert 0 < row.n_cells < min(na, nb)


def test_trip_stats(spark):
    # u1: A,B,B,C -> 4 events, 2 moves (B->B excluded), 3 cells,
    #     revisit (4-3)*1e6 div 4 = 250000
    # u2: A -> 1 event, 0 moves, 0 revisit
    rows = [(1, 10, 1, "A"), (1, 20, 2, "B"), (1, 30, 3, "B"),
            (1, 40, 4, "C"), (2, 5, 9, "A")]
    df = spark.createDataFrame(rows, "u long, t long, e long, cell string")
    out = {r.u: r for r in trip_stats(df, "u", "t", "e", "cell", 10)
           .collect()}
    assert (out[1].n_events, out[1].n_moves, out[1].n_cells,
            out[1].revisit_ppm, out[1].rank) == (4, 2, 3, 250000, 1)
    assert (out[2].n_events, out[2].n_moves, out[2].n_cells,
            out[2].revisit_ppm, out[2].rank) == (1, 0, 1, 0, 2)


def test_mean_center_hand_computed(spark):
    # class 'p': points (0,0), (10,0), (20,30) ->
    #   cx = 30 div 3 = 10, cy = 30 div 3 = 10
    #   SD = sqrt(n*(Sxx+Syy) - Sx^2 - Sy^2)/n
    #      = sqrt(3*(500+900) - 900 - 900)/3 = sqrt(2400)/3
    # class 'n': negative coords -> truncation toward ZERO (div), not floor
    rows = [("p", 0.0, 0.0), ("p", 10.0, 0.0), ("p", 20.0, 30.0),
            ("n", -7.0, -7.0), ("n", -4.0, -4.0)]
    df = spark.createDataFrame(rows, "cls string, x double, y double")
    out = {r.cls: r for r in mean_center(df, "cls", "x", "y").collect()}
    p = out["p"]
    assert (p.n_pts, p.cx_m, p.cy_m) == (3, 10, 10)
    assert p.std_m == round(math.sqrt(2400) / 3)
    n = out["n"]
    # sum = -11 -> -11 div 2 == -5 (toward zero; floor would give -6)
    assert (n.cx_m, n.cy_m) == (-5, -5)
