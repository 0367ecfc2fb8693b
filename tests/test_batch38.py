"""Batch 38 (round 6): 2SFCA accessibility — hand-worked catchments."""

from pyspark.sql import functions as F

from dggstools_spark.operators.access import access_2sfca


def _run(spark, pop_rows, fac_rows, res=2, kmax=1):
    pop = spark.createDataFrame(pop_rows, "cellid string, pop long")
    fac = spark.createDataFrame(
        fac_rows, "fac_id long, cellid string, cap long")
    return {r.cellid: (r.access_q9, r.n_fac)
            for r in access_2sfca(pop, fac, res, kmax).collect()}


def test_2sfca_hand_worked_single_facility(spark):
    # facility cap 10 at N44; pop: N44=2, N45=3 (adjacent), N00=5 (far)
    # catchment pop = 5 -> ratio = 2e9; N00 out of reach -> absent
    out = _run(spark, [("N44", 2), ("N45", 3), ("N00", 5)],
               [(1, "N44", 10)])
    assert out == {"N44": (2_000_000_000, 1), "N45": (2_000_000_000, 1)}


def test_2sfca_overlapping_catchments_add(spark):
    # two facilities, N44 and N45: both catchments cover both pop cells
    # (pop 2+3=5 each): ratios 10*1e9/5=2e9 and 5*1e9/5=1e9 -> sum 3e9
    out = _run(spark, [("N44", 2), ("N45", 3)],
               [(1, "N44", 10), (2, "N45", 5)])
    assert out == {"N44": (3_000_000_000, 2), "N45": (3_000_000_000, 2)}


def test_2sfca_empty_catchment_facility_dropped(spark):
    # facility at N00 has no population within k=1 -> contributes nothing
    out = _run(spark, [("N44", 4)], [(1, "N44", 8), (2, "N00", 100)])
    assert out == {"N44": (2_000_000_000, 1)}


def test_2sfca_truncated_ratio_is_exact_division(spark):
    # cap 10 over pop 3 -> 3333333333 (truncated), engine-exact
    out = _run(spark, [("N44", 3)], [(1, "N44", 10)])
    assert out == {"N44": (10 * 10**9 // 3, 1)}


def test_2sfca_crossface_catchment_reaches_over_seam(spark):
    # demand on face N edge, facility across the seam on an adjacent
    # face: cross_face=True must connect them at kmax=1
    pop = spark.createDataFrame([("N00", 7)], "cellid string, pop long")
    # find a neighbor of N00 on another face via the topology relation
    from dggstools_spark.operators.spatial_stats import cell_neighbors
    one = spark.createDataFrame([("N00",)], "cellid string")
    nbrs = [r.nbr for r in cell_neighbors(one, 2, True).collect()]
    xf = sorted(n for n in nbrs if not n.startswith("N"))[0]
    fac = spark.createDataFrame(
        [(1, xf, 9)], "fac_id long, cellid string, cap long")
    out = {r.cellid: (r.access_q9, r.n_fac)
           for r in access_2sfca(pop, fac, 2, 1).collect()}
    assert out == {"N00": (9 * 10**9 // 7, 1)}


def test_voronoi_hand_worked(spark):
    from dggstools_spark.operators.access import voronoi_assign

    # facilities: f1 at N44, f2 at N48 ((5,5), diagonal ring 1 of N44)
    dem = spark.createDataFrame(
        [("N44",), ("N45",), ("N48",), ("N00",)], "cellid string")
    fac = spark.createDataFrame(
        [(1, "N44"), (2, "N48")], "fac_id long, cellid string")
    out = {r.cellid: (r.fac_id, r.ring)
           for r in voronoi_assign(dem, fac, 2, 2).collect()}
    assert out["N44"] == (1, 0)          # own cell wins at ring 0
    assert out["N48"] == (2, 0)
    # N45 (4,5): ring 1 of BOTH facilities -> tie to min fac_id
    assert out["N45"] == (1, 1)
    # N00 is 4 rings from both -> beyond kmax=2, excluded
    assert "N00" not in out


def test_voronoi_ring0_beats_adjacent_facility(spark):
    from dggstools_spark.operators.access import voronoi_assign

    dem = spark.createDataFrame([("N44",)], "cellid string")
    fac = spark.createDataFrame(
        [(9, "N44"), (1, "N45")], "fac_id long, cellid string")
    out = voronoi_assign(dem, fac, 2, 1).collect()[0]
    # facility 9 sits IN the cell: ring 0 beats fac 1's ring 1 despite id
    assert (out.fac_id, out.ring) == (9, 0)
