"""Batch 41 (round 6): quantized IPF / Furness balancing.

Checked against an independent Python integer-IPF (same q6 scaling,
same truncating div, same round structure) and a closed-form 2×2 case
that converges exactly in one round pair.
"""

from dggstools_spark.operators.ipf import Q6, ipf_balance


def _ref_ipf(seed, rt, ct, rounds):
    t = {k: v * Q6 for k, v in seed.items()}
    for _ in range(rounds):
        rs = {}
        for (o, d), v in t.items():
            rs[o] = rs.get(o, 0) + v
        t = {(o, d): v * (rt[o] * Q6) // rs[o]
             for (o, d), v in t.items()}
        cs = {}
        for (o, d), v in t.items():
            cs[d] = cs.get(d, 0) + v
        t = {(o, d): v * (ct[d] * Q6) // cs[d]
             for (o, d), v in t.items()}
    return t


def _run(spark, seed, rt, ct, rounds):
    sdf = spark.createDataFrame(
        [(o, d, v) for (o, d), v in sorted(seed.items())],
        "o string, d string, t long")
    rdf = spark.createDataFrame(sorted(rt.items()),
                                "o string, tgt long")
    cdf = spark.createDataFrame(sorted(ct.items()),
                                "d string, tgt long")
    return {(r.o, r.d): r.t_q6
            for r in ipf_balance(sdf, rdf, cdf, rounds).collect()}


def test_ipf_2x2_exact_one_round(spark):
    seed = {("a", "x"): 1, ("a", "y"): 1, ("b", "x"): 1, ("b", "y"): 1}
    rt, ct = {"a": 3, "b": 1}, {"x": 2, "y": 2}
    got = _run(spark, seed, rt, ct, 1)
    assert got == {("a", "x"): 1_500_000, ("a", "y"): 1_500_000,
                   ("b", "x"): 500_000, ("b", "y"): 500_000}
    # margins met exactly
    assert got[("a", "x")] + got[("a", "y")] == 3 * Q6


def test_ipf_matches_integer_reference(spark):
    seed = {("a", "x"): 1, ("a", "y"): 2, ("b", "x"): 3,
            ("b", "y"): 4, ("c", "x"): 5, ("c", "z"): 1}
    rt, ct = {"a": 10, "b": 5, "c": 7}, {"x": 9, "y": 6, "z": 7}
    for rounds in (1, 3):
        assert _run(spark, seed, rt, ct, rounds) == _ref_ipf(
            seed, rt, ct, rounds)


def test_ipf_margins_converge(spark):
    seed = {("a", "x"): 1, ("a", "y"): 2, ("b", "x"): 3, ("b", "y"): 4}
    rt, ct = {"a": 6, "b": 4}, {"x": 5, "y": 5}
    got = _run(spark, seed, rt, ct, 6)
    rows = {}
    cols = {}
    for (o, d), v in got.items():
        rows[o] = rows.get(o, 0) + v
        cols[d] = cols.get(d, 0) + v
    for o, tgt in rt.items():
        assert abs(rows[o] - tgt * Q6) <= tgt * 10  # within 10 ppm-ish
    for d, tgt in ct.items():
        assert abs(cols[d] - tgt * Q6) <= tgt * Q6 // 100


def test_region_shape_closed_forms(spark):
    from dggstools_spark.operators.shape import region_shape

    # 2x2 filled square (rows/cols 4-5): area 4, perimeter 8, iq = 1e6
    sq = [("N44", "S"), ("N45", "S"), ("N47", "S"), ("N48", "S")]
    # 1x3 horizontal bar at row 0, cols 3-5: area 3, perimeter 8
    bar = [("N10", "B"), ("N11", "B"), ("N12", "B")]
    df = spark.createDataFrame(sq + bar, "cellid string, region string")
    out = {r.region: (r.n_cells, r.perimeter, r.iq_ppm)
           for r in region_shape(df, 2).collect()}
    assert out["S"] == (4, 8, 1_000_000)
    assert out["B"] == (3, 8, 16 * 3 * 10**6 // 64)  # 750_000


def test_region_shape_singleton_and_adjacent_regions(spark):
    from dggstools_spark.operators.shape import region_shape

    # two ADJACENT cells in DIFFERENT regions: the shared edge is
    # exposed for both (perimeter counts same-region neighbors only)
    df = spark.createDataFrame(
        [("N44", "A"), ("N45", "B")], "cellid string, region string")
    out = {r.region: (r.n_cells, r.perimeter, r.iq_ppm)
           for r in region_shape(df, 2).collect()}
    assert out["A"] == (1, 4, 1_000_000)
    assert out["B"] == (1, 4, 1_000_000)


def test_region_shape_seam_edges_exposed(spark):
    from dggstools_spark.operators.shape import region_shape

    # a corner cell's off-face sides count as exposed (within-face
    # perimeter contract), so a singleton at the face corner still
    # has perimeter 4
    df = spark.createDataFrame([("N00", "C")],
                               "cellid string, region string")
    out = region_shape(df, 2).collect()[0]
    assert (out.n_cells, out.perimeter, out.iq_ppm) == (1, 4, 1_000_000)


def test_areal_transfer_hand_worked(spark):
    from dggstools_spark.operators.interp import areal_transfer

    # source A (10 cells, v=700) overlaps target X with 4 cells and
    # target Y with 6; source B (4 cells, v=100) overlaps Y with 1
    overlap = spark.createDataFrame(
        [("A", "X", 4), ("A", "Y", 6), ("B", "Y", 1)],
        "a_id string, b_id string, n_ov long")
    sizes = spark.createDataFrame([("A", 10), ("B", 4)],
                                  "a_id string, n_src_cells long")
    vals = spark.createDataFrame([("A", 700), ("B", 100)],
                                 "a_id string, v long")
    out = {r.b_id: (r.est_q6, r.n_src)
           for r in areal_transfer(overlap, sizes, vals).collect()}
    assert out["X"] == (700 * 10**6 * 4 // 10, 1)          # 280e6
    assert out["Y"] == (700 * 10**6 * 6 // 10
                        + 100 * 10**6 * 1 // 4, 2)          # 445e6
    # pycnophylactic check: A's mass splits exactly across X and Y
    assert (700 * 10**6 * 4 // 10 + 700 * 10**6 * 6 // 10
            == 700 * 10**6)
