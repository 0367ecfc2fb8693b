"""Batch 32 (round 6): lattice hydrology + terrain + Ripley's K.

flow_dir / watershed are verified against an INDEPENDENT driver-side
pointer walk (follow nxt until fixpoint) so the pointer-doubling rounds
can't drift from the one-step relation they square.  slope_aspect is
checked on closed-form surfaces (flat -> all zero; a linear col ramp ->
Horn gx = 8 exactly on interior cells).  ripley_k is checked against a
hand-countable two-cell configuration.
"""

from pyspark.sql import functions as F

from dggstools_spark.operators.hydro import (elev_range, elev_spark,
                                             flow_dir, slope_aspect,
                                             watershed)
from dggstools_spark.operators.pointpat import ripley_k


def _face_cells(spark, res: int, face: str = "N"):
    """Every cell of one face at `res` (3^res x 3^res lattice)."""
    n = 3 ** res
    rows = []
    for r in range(n):
        for c in range(n):
            digits = []
            rr, cc = r, c
            for lvl in range(res - 1, -1, -1):
                w = 3 ** lvl
                digits.append(str((rr // w) * 3 + (cc // w)))
                rr, cc = rr % w, cc % w
            rows.append((face + "".join(digits), r, c))
    return spark.createDataFrame(rows, "cellid string, row int, col int")


def test_flow_dir_pits_and_strict_descent(spark):
    cells = (_face_cells(spark, 2)
             .withColumn("z", F.expr(elev_spark(2)))
             .select("cellid", "z"))
    out = flow_dir(cells, 2, cross_face=False).collect()
    z = {r.cellid: r.z for r in out}
    n_pits = 0
    for r in out:
        if r.nxt == r.cellid:
            n_pits += 1
            assert r.drop == 0
        else:
            assert z[r.cellid] - z[r.nxt] == r.drop and r.drop > 0
    assert 1 <= n_pits < len(out)


def test_flow_dir_argmax_and_tiebreak(spark):
    # hand-built 1-face res-1 surface: center 9 flows to the unique min
    rows = [("N0", 5), ("N1", 3), ("N2", 5),
            ("N3", 3), ("N4", 9), ("N5", 5),
            ("N6", 5), ("N7", 5), ("N8", 0)]
    cells = spark.createDataFrame(rows, "cellid string, z long")
    out = {r.cellid: (r.nxt, r.drop)
           for r in flow_dir(cells, 1, cross_face=False).collect()}
    assert out["N4"] == ("N8", 9)          # steepest drop wins
    # N0 (z=5): drops of 2 to both N1 and N3 -> lexicographic min N1
    assert out["N0"] == ("N1", 2)
    assert out["N8"] == ("N8", 0)          # global min is a pit


def test_watershed_matches_iterated_pointer_walk(spark):
    import math

    res = 2
    cells = (_face_cells(spark, res)
             .withColumn("z", F.expr(elev_spark(res)))
             .select("cellid", "z"))
    nxt = {r.cellid: r.nxt
           for r in flow_dir(cells, res, cross_face=False).collect()}

    def terminal(c):
        while nxt[c] != c:
            c = nxt[c]
        return c

    d = max(1, math.ceil(math.log2(elev_range(res) + 1)))
    got = {r.cellid: r.pit
           for r in watershed(cells, res, d, cross_face=False).collect()}
    assert got == {c: terminal(c) for c in nxt}
    # every label is a pit; labels partition the cells
    assert all(nxt[p] == p for p in set(got.values()))


def test_slope_aspect_flat_surface(spark):
    cells = _face_cells(spark, 2).select(
        "cellid", F.lit(7).cast("long").alias("z"))
    out = slope_aspect(cells, 2).collect()
    assert len(out) == 81
    for r in out:
        assert (r.gx, r.gy, r.slope_ppm, r.aspect_oct) == (0, 0, 0, -1)


def test_slope_aspect_linear_ramp_interior(spark):
    # z = col: interior Horn gx = 4*(col+1) - 4*(col-1) = 8, gy = 0;
    # aspect octant (gx>0, gy=0) = 0; slope_ppm = 1e6 * 8/8 = 1e6
    lat = _face_cells(spark, 2)
    cells = lat.select("cellid", F.col("col").cast("long").alias("z"))
    seam = {r.cellid for r in lat.filter(
        "row = 0 or col = 0 or row = 8 or col = 8").collect()}
    out = slope_aspect(cells, 2).collect()
    for r in out:
        assert r.on_seam == int(r.cellid in seam)
        if not r.on_seam:
            assert (r.gx, r.gy) == (8, 0)
            assert r.slope_ppm == 1_000_000 and r.aspect_oct == 0


def test_ripley_k_two_cell_hand_count(spark):
    # two edge-adjacent cells, n=3 and n=2: N=5, ordered pairs N(N-1)=20
    # pairs(0) = 3*2 + 2*1 = 8; pairs(1) = 2*3*2 = 12; cum(1) = 20
    cells = spark.createDataFrame(
        [("N44", 3), ("N45", 2)], "cellid string, n long")
    out = {r.r: (r.pairs_r, r.cum_pairs, r.k_ppm)
           for r in ripley_k(cells, 2, 2).collect()}
    assert out[0] == (8, 8, 400_000)
    assert out[1] == (12, 20, 1_000_000)
    assert out[2] == (0, 20, 1_000_000)   # everything within distance 2


def test_ripley_k_monotone_and_bounded(spark, sf_dir):
    from dggstools_spark.functions import encode_sql
    from dggstools_spark.queries3 import load
    from dggstools_spark.sources import synth

    docs = synth.with_lonlat(load(spark, sf_dir, "documents"), "doc_id")
    cells = (encode_sql.spark_encode(docs, "lon", "lat", 2)
             .groupBy("cellid").agg(F.count("*").alias("n"))
             .localCheckpoint(eager=True))
    rows = sorted(ripley_k(cells, 2, 3).collect(), key=lambda r: r.r)
    assert [r.r for r in rows] == [0, 1, 2, 3]
    cums = [r.cum_pairs for r in rows]
    assert cums == sorted(cums)
    assert all(0 <= r.k_ppm <= 1_000_000 for r in rows)


def _vs_run(spark, cells, towers, radius, h=1):
    from dggstools_spark.operators.hydro import viewshed

    cdf = spark.createDataFrame(cells, "cellid string, z long")
    tdf = spark.createDataFrame([(t,) for t in towers], "cellid string")
    return {(r.tower, r.ray): (r.n_cells, r.n_visible)
            for r in viewshed(cdf, 2, tdf, radius, h).collect()}


def test_viewshed_hand_worked_ray(spark):
    # tower N44 (4,4) z=10 -> tz=11; east ray cells (4,5..8):
    # k1 z5 slope -6e9 vis; k2 z8 slope -1.5e9 vis; k3 z5 slope -2e9
    # blocked; k4 z20 slope 2.25e9 vis
    # cell math: (4,6) digits (4//3,6//3)=(1,2)->5, (4%3,6%3)=(1,0)->3
    out = _vs_run(spark, [("N44", 10), ("N45", 5), ("N53", 8),
                          ("N54", 5), ("N55", 20)], ["N44"], 8)
    # east ray = dir (0,1) -> ray id (0+1)*3 + (1+1) = 5
    # (4,5)=N45 k1, (4,6)=N53 k2, (4,7)=N54 k3, (4,8)=N55 k4
    assert out[("N44", 5)] == (4, 3)


def test_viewshed_absent_cells_transparent(spark):
    # drop the k2 cell: k3's prefix max is only k1's slope
    # k1 z5 slope -6e9 vis; k3 z5 slope -2e9 > -6e9 -> NOW visible
    out = _vs_run(spark, [("N44", 10), ("N45", 5), ("N54", 5)],
                  ["N44"], 8)
    assert out[("N44", 5)] == (2, 2)


def test_viewshed_equal_quantized_slope_blocks(spark):
    # k1 z13 slope 2e9; k2 z15 slope (15-11)*1e9 div 2 = 2e9 == -> block
    out = _vs_run(spark, [("N44", 10), ("N45", 13), ("N53", 15)],
                  ["N44"], 8)
    assert out[("N44", 5)] == (2, 1)


def test_viewshed_all_eight_rays_from_center(spark):
    # uniform terrain: every ray's first cell visible, rest blocked?
    # flat: slope_q9(k) = ((0 - 1) * 1e9) div k = -1e9 div k, increasing
    # in k (toward 0) -> every cell strictly above the prefix max ->
    # ALL visible (grazing ascent along flat ground with tower height 1)
    cells = [(f"N{a}{b}", 5) for a in range(9) for b in range(9)]
    out = _vs_run(spark, cells, ["N44"], 8)
    assert len([1 for (t, r) in out if t == "N44"]) == 8
    for (t, r), (n, v) in out.items():
        assert n == v  # flat terrain: everything visible from height
