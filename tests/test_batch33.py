"""Batch 33 (round 6): Mann-Kendall trend, G-function, flow accumulation.

mk_trend is checked against hand-worked S / tie-corrected var18 / tau
values; flow_accum against an independent driver-side path walk (the
same oracle-independence discipline as watershed's test); g_function on
a hand-built two-neighbors-plus-far-outlier configuration where the
censoring rule is visible.
"""

from pyspark.sql import functions as F

from dggstools_spark.operators.hydro import (elev_range, elev_spark,
                                             flow_accum, flow_dir)
from dggstools_spark.operators.pointpat import g_function
from dggstools_spark.operators.trend import mk_trend

from tests.test_batch32 import _face_cells


def test_mk_trend_hand_worked(spark):
    rows = [("up", 0, 1), ("up", 1, 2), ("up", 2, 3),
            ("tie", 0, 2), ("tie", 1, 2), ("tie", 2, 5),
            ("down", 0, 5), ("down", 1, 3), ("down", 2, 1)]
    obs = spark.createDataFrame(rows, "k string, t long, y long")
    out = {r.k: r for r in mk_trend(obs, "k", "t", "y", 10).collect()}
    # strictly increasing: S = 3, no ties -> var18 = 3*2*11 = 66
    assert (out["up"].s, out["up"].var18, out["up"].tau_ppm) == (
        3, 66, 1_000_000)
    # one tie pair: S = 2, tie group of 2 -> var18 = 66 - 2*1*9 = 48
    assert (out["tie"].s, out["tie"].var18, out["tie"].tau_ppm) == (
        2, 48, 666_666)
    # strictly decreasing: S = -3 (tau truncates toward zero: -1e6)
    assert (out["down"].s, out["down"].tau_ppm) == (-3, -1_000_000)
    # ranking: S desc, key asc
    assert [r.k for r in sorted(out.values(), key=lambda r: r.rank)] == [
        "up", "tie", "down"]


def test_mk_trend_single_bucket_excluded_and_bounds(spark):
    rows = [("solo", 7, 9)] + [("b", t, t * t % 5) for t in range(6)]
    obs = spark.createDataFrame(rows, "k string, t long, y long")
    out = {r.k: r for r in mk_trend(obs, "k", "t", "y", 10).collect()}
    assert "solo" not in out
    n = out["b"].n_buckets
    assert abs(out["b"].s) <= n * (n - 1) // 2
    assert abs(out["b"].tau_ppm) <= 1_000_000


def test_g_function_hand_built(spark):
    # N44/N45 edge-adjacent (nn = 1 each); N00 sits 4 rings away from
    # both (> kmax = 2) -> censored; denominator still 3
    cells = spark.createDataFrame(
        [("N44",), ("N45",), ("N00",)], "cellid string")
    out = {r.r: r for r in g_function(cells, 2, 2).collect()}
    assert (out[1].n_le, out[1].n_total, out[1].n_censored) == (2, 3, 1)
    assert out[1].g_ppm == 666_666
    assert (out[2].n_le, out[2].g_ppm) == (2, 666_666)


def test_g_function_all_adjacent_saturates(spark):
    # (row,col) = (4,4), (4,5), (5,4): digit d encodes (d div 3, d % 3)
    # per level, so (5,4) is N47 — a queen-adjacent L around N44
    cells = spark.createDataFrame(
        [("N44",), ("N45",), ("N47",)], "cellid string")
    out = {r.r: r for r in g_function(cells, 2, 2).collect()}
    assert out[1].n_censored == 0
    assert out[1].g_ppm == 1_000_000 == out[2].g_ppm


def test_flow_accum_matches_path_walk(spark):
    import math

    res = 2
    cells = (_face_cells(spark, res)
             .withColumn("z", F.expr(elev_spark(res)))
             .select("cellid", "z"))
    nxt = {r.cellid: r.nxt
           for r in flow_dir(cells, res, cross_face=False).collect()}
    # independent: count, per cell w, the sources whose path contains w
    expect = {c: 0 for c in nxt}
    for u in nxt:
        c = u
        seen = {c}
        expect[c] += 1
        while nxt[c] != c:
            c = nxt[c]
            assert c not in seen  # acyclic (strict descent)
            seen.add(c)
            expect[c] += 1
    d = max(1, math.ceil(math.log2(elev_range(res) + 1)))
    got = {r.cellid: r.acc
           for r in flow_accum(cells, res, d, cross_face=False).collect()}
    assert got == expect
    # conservation: total accumulation = total path cells
    assert sum(got.values()) == sum(expect.values())
    assert min(got.values()) >= 1


def test_cross_k_hand_counts(spark):
    from dggstools_spark.operators.pointpat import cross_k

    # A: N44=2, N47=1;  B: N44=3 (same cell), N45=4 (ring 1 of N44;
    # ring 1 of N47 too — (5,4) vs (4,5) is diagonal)
    a = spark.createDataFrame([("N44", 2), ("N47", 1)],
                              "cellid string, n long")
    b = spark.createDataFrame([("N44", 3), ("N45", 4)],
                              "cellid string, n long")
    out = {r.r: (r.pairs_r, r.cum_pairs, r.kx_ppm)
           for r in cross_k(a, b, 2, 2).collect()}
    # r0: 2*3 = 6; r1: N44->N45 2*4=8, N47->N44 1*3=3, N47->N45 1*4=4
    # total pairs = 3 * 7 = 21
    assert out[0] == (6, 6, 6 * 10**6 // 21)
    assert out[1] == (15, 21, 1_000_000)
    assert out[2] == (0, 21, 1_000_000)


def test_cross_k_no_colocated_r0_is_zero(spark):
    from dggstools_spark.operators.pointpat import cross_k

    a = spark.createDataFrame([("N44", 5)], "cellid string, n long")
    b = spark.createDataFrame([("N00", 2)], "cellid string, n long")
    out = {r.r: r.pairs_r for r in cross_k(a, b, 2, 2).collect()}
    assert out == {0: 0, 1: 0, 2: 0}  # B beyond kmax entirely


def test_theilsen_hand_worked(spark):
    from dggstools_spark.operators.trend import theilsen

    # key 'k': (t, y) = (0,0), (1,10), (2,14), (3,100):
    # slopes: (0,1)=10, (0,2)=7, (0,3)=33.33(100/3), (1,2)=4,
    #         (1,3)=45, (2,3)=86
    # sorted: 4, 7, 10, 100/3, 45, 86 -> n=6, lower median rank 3 -> 10
    obs = spark.createDataFrame(
        [("k", 0, 0), ("k", 1, 10), ("k", 2, 14), ("k", 3, 100)],
        "k string, t long, y long")
    out = {r.k: r for r in theilsen(obs, "k", "t", "y").collect()}
    r = out["k"]
    assert (r.n_pairs, r.med_num, r.med_den, r.slope_q6) == (
        6, 10, 1, 10_000_000)


def test_theilsen_robust_to_outlier(spark):
    from dggstools_spark.operators.trend import theilsen

    # perfect slope 2 with one wild outlier at the end: the median of
    # pairwise slopes stays 2 (OLS would not)
    rows = [("k", t, 2 * t) for t in range(6)] + [("k", 6, 1000)]
    obs = spark.createDataFrame(rows, "k string, t long, y long")
    r = theilsen(obs, "k", "t", "y").collect()[0]
    assert r.med_num * 1 == 2 * r.med_den  # slope exactly 2
    assert r.slope_q6 == 2_000_000


def test_theilsen_odd_pair_count_exact_median(spark):
    from dggstools_spark.operators.trend import theilsen

    # 3 buckets -> 3 pairs (odd): median is the exact middle slope
    obs = spark.createDataFrame(
        [("k", 0, 0), ("k", 1, 5), ("k", 3, 6)],
        "k string, t long, y long")
    # slopes: (0,1)=5, (0,3)=2, (1,3)=1/2 -> sorted 0.5, 2, 5 -> med 2
    r = theilsen(obs, "k", "t", "y").collect()[0]
    assert (r.n_pairs, r.med_num, r.med_den, r.slope_q6) == (
        3, 6, 3, 2_000_000)


def test_fj_function_singleton_closed_form(spark):
    from dggstools_spark.operators.pointpat import fj_function

    # one occupied cell at the face center: F counts the Chebyshev disk
    # (1, 9, 25 cells at r=0,1,2 over the 81-cell face); G has no other
    # occupied cell -> g_le = 0, so J = f_tot div (f_tot - f_le)
    cells = spark.createDataFrame([("N44",)], "cellid string")
    out = {r.r: r for r in fj_function(cells, 2, 2).collect()}
    assert (out[1].f_le, out[1].f_tot) == (9, 81)
    assert (out[2].f_le, out[2].g_le, out[2].g_tot) == (25, 0, 1)
    assert out[1].j_ppm == 1 * 81 * 10**6 // (72 * 1)   # 1_125_000
    assert out[2].j_ppm == 81 * 10**6 // 56             # 1_446_428


def test_fj_function_clustered_pair_j_zero(spark):
    from dggstools_spark.operators.pointpat import fj_function

    # two adjacent occupied cells: G(1) = 1 (each sees the other) ->
    # numerator g_tot - g_le = 0 -> J = 0 (maximal clustering signal)
    cells = spark.createDataFrame([("N44",), ("N45",)], "cellid string")
    out = {r.r: r for r in fj_function(cells, 2, 2).collect()}
    assert out[1].g_le == 2 and out[1].j_ppm == 0
    assert out[2].j_ppm == 0


def test_dissimilarity_closed_forms(spark):
    from dggstools_spark.operators.diversity import dissimilarity

    # identical distributions -> D = 0
    a = spark.createDataFrame([("X", 2), ("Y", 6)],
                              "cellid string, n long")
    r = dissimilarity(a, a).collect()[0]
    assert (r.d_ppm, r.n_cells, r.a_total, r.b_total) == (0, 2, 8, 8)
    # disjoint distributions -> D = 1e6
    b = spark.createDataFrame([("Z", 5)], "cellid string, n long")
    r = dissimilarity(a, b).collect()[0]
    assert r.d_ppm == 1_000_000 and r.n_cells == 3
    # hand-worked: A = (4, 4), B = (2, 6): D = 0.5*(|1/2-1/4|+|1/2-3/4|)
    #            = 0.25 -> 250_000 ppm
    a2 = spark.createDataFrame([("X", 4), ("Y", 4)],
                               "cellid string, n long")
    b2 = spark.createDataFrame([("X", 2), ("Y", 6)],
                               "cellid string, n long")
    assert dissimilarity(a2, b2).collect()[0].d_ppm == 250_000


def test_location_quotient_hand_worked(spark):
    from dggstools_spark.operators.diversity import location_quotient

    # A = (6, 2) of 8, B = (2, 6) of 8: LQ(X) = (6/8)/(2/8) = 3,
    # LQ(Y) = (2/8)/(6/8) = 1/3; B-absent cell excluded
    a = spark.createDataFrame([("X", 6), ("Y", 2), ("W", 1)],
                              "cellid string, n long")
    b = spark.createDataFrame([("X", 2), ("Y", 6)],
                              "cellid string, n long")
    out = {r.cellid: (r.lq_ppm, r.rank)
           for r in location_quotient(a, b, 10).collect()}
    # totals: A = 9, B = 8: LQ(X) = (6/9)/(2/8) = 8/3 -> 2_666_666
    assert out["X"] == (2_666_666, 1)
    assert out["Y"] == (2 * 8 * 10**6 // (9 * 6), 2)  # 296_296
    assert "W" not in out
