"""Round-6 batch 26: integer PageRank + distance-threshold self-join."""

import numpy as np

from dggstools_spark.dggs.cells import HALF_SIDE
from dggstools_spark.operators.graph import PPB, page_rank
from dggstools_spark.operators.spatial_join import near_pairs


def _pr_python(edges, iters, d_ppb):
    """Exact replica of the operator's integer recurrence (Python ints;
    // == Spark div for the non-negative quantities involved)."""
    w = {}
    for u, v, x in edges:
        w[(u, v)] = w.get((u, v), 0) + x
    outm = {}
    for (u, v), x in w.items():
        outm[u] = outm.get(u, 0) + x
    nodes = sorted({u for u, _ in w} | {v for _, v in w})
    n = len(nodes)
    base = (PPB - d_ppb) // n
    p = {v: PPB // n for v in nodes}
    for _ in range(iters):
        c = {v: 0 for v in nodes}
        for (u, v), x in w.items():
            c[v] += (d_ppb * ((p[u] * x) // outm[u])) // PPB
        p = {v: base + c[v] for v in nodes}
    return p


def test_page_rank_matches_integer_replica(spark):
    edges = [("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 2),
             ("d", "a", 1), ("a", "b", 1)]  # parallel edge a->b sums
    df = spark.createDataFrame(edges, "s string, d string, w long")
    out = {r.node: r for r in
           page_rank(df, "s", "d", "w", iters=4).collect()}
    exp = _pr_python(edges, 4, 850_000_000)
    assert set(out) == set(exp)
    for v in exp:
        assert out[v].p_ppb == exp[v], v
    # deterministic ranking (p desc, node asc), dangling d gets base-only
    ranks = [r.node for r in sorted(out.values(), key=lambda r: r.rank)]
    assert ranks == sorted(exp, key=lambda v: (-exp[v], v))
    assert out["d"].p_ppb == min(r.p_ppb for r in out.values())


def test_page_rank_sink_concentrates(spark):
    # star: everything points at 'hub' -> hub ranks 1
    edges = [(s, "hub", 1) for s in ("x", "y", "z")]
    df = spark.createDataFrame(edges, "s string, d string, w long")
    out = page_rank(df, "s", "d", "w", iters=3, k=1).collect()
    assert out[0].node == "hub" and out[0].rank == 1


def test_near_pairs_matches_brute_force(spark):
    rng = np.random.default_rng(11)
    s = float(HALF_SIDE)
    n = 250
    xs = rng.uniform(-1.5 * s, 1.5 * s, n)
    ys = rng.uniform(-0.4 * s, 0.4 * s, n)
    # densify a cluster so the threshold actually bites
    xs[:40] = xs[0] + rng.uniform(-2e5, 2e5, 40)
    ys[:40] = ys[0] + rng.uniform(-2e5, 2e5, 40)
    d_m = 150_000.0
    res = 1  # block width s/3 ~ 3.3e6 m >= d
    df = spark.createDataFrame(
        [(int(i), float(xs[i]), float(ys[i])) for i in range(n)],
        "id long, px double, py double")
    got = {(r.a_id, r.b_id): r.dist_mm
           for r in near_pairs(df, d_m, res).collect()}
    exp = {}
    for i in range(n):
        for j in range(i + 1, n):
            mm = round(float(np.sqrt((xs[i] - xs[j]) ** 2
                                     + (ys[i] - ys[j]) ** 2)) * 1000.0)
        # (recompute in python float to mirror the engine expression)
            if mm <= round(d_m * 1000.0):
                exp[(i, j)] = mm
    assert got == exp and len(exp) > 50


def test_near_pairs_res_guard(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, px double, py double")
    try:
        near_pairs(df, 1e9, 5)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "coarser res" in str(e)


def test_hll_matches_python_replica_and_is_accurate(spark):
    import hashlib

    from dggstools_spark.operators.sketch import (HLL_M, _C, _LIN, _RMAX,
                                                  hll_distinct)

    def hll_py(keys):
        regs = {}
        for s in keys:
            h = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
            b, v = divmod(h, 1 << (_RMAX - 1))
            rho = _RMAX if v == 0 else _RMAX - v.bit_length()
            regs[b] = max(regs.get(b, 0), rho)
        s_int = sum(1 << (_RMAX - r) for r in regs.values()) \
            + (HLL_M - len(regs)) * (1 << _RMAX)
        e = _C / float(s_int)
        v0 = HLL_M - len(regs)
        if e <= 2.5 * HLL_M and v0 > 0:
            return _LIN[v0]
        return round(e)

    n = 2000
    keys = [f"key-{i}" for i in range(n)]
    rows = [("a", k) for k in keys] + [("a", k) for k in keys[:500]]
    df = spark.createDataFrame(rows, "cls string, k string")
    out = hll_distinct(df, "cls", "k").collect()[0]
    assert out.hll_est == hll_py(keys)  # duplicates change nothing
    # 256 registers -> ~6.5% standard error; 4 sigma bound
    assert abs(out.hll_est - n) / n < 0.26


def test_segment_cells_supercover(spark):
    from dggstools_spark.dggs import cells as K
    from dggstools_spark.operators.spatial_join import segment_cells

    s = float(HALF_SIDE)
    res = 3
    segs = [(1, 0.1 * s, 0.05 * s, 0.9 * s, 0.41 * s),   # diagonal
            (2, -0.5 * s, -0.2 * s, -0.5 * s, -0.2 * s)]  # degenerate point
    df = spark.createDataFrame(
        segs, "seg_id long, x1 double, y1 double, x2 double, y2 double")
    out = {}
    for r in segment_cells(df, res).collect():
        out.setdefault(r.seg_id, set()).add(r.cellid)
    # dense sampling along segment 1: every sampled cell must be covered
    t = np.linspace(0.0, 1.0, 4000)
    xs = segs[0][1] + (segs[0][3] - segs[0][1]) * t
    ys = segs[0][2] + (segs[0][4] - segs[0][2]) * t
    sampled = set(K.planar_to_cellid(xs, ys, res))
    assert sampled <= out[1]
    # supercover is tight: no cell further than one diagonal from the line
    assert len(out[1]) <= len(sampled) + 8
    # the degenerate point-segment burns exactly its containing cell
    assert out[2] == set(K.planar_to_cellid(
        np.array([segs[1][1]]), np.array([segs[1][2]]), res))


def test_change_matrix(spark):
    from dggstools_spark.operators.raster import change_matrix

    a = spark.createDataFrame(
        [("c1", 1), ("c2", 1), ("c3", 2)], "cellid string, band1 long")
    b = spark.createDataFrame(
        [("c1", 1), ("c2", 2), ("c4", 3)], "cellid string, band1 long")
    out = {(r.class_from, r.class_to): r.n_cells
           for r in change_matrix(a, b, 4).collect()}
    assert out == {(1, 1): 1,   # unchanged
                   (1, 2): 1,   # changed
                   (2, -1): 1,  # disappeared
                   (-1, 3): 1}  # appeared


def test_hll_overlap_estimates_track_truth(spark):
    # wiring sanity at query level: est_inter within the sketch's error
    # band of the exact intersection
    from dggstools_spark.queries24 import q_hll_overlap
    r = q_hll_overlap(spark, "/root/testdata/sf0.001").collect()[0]
    assert r.exact_inter > 0
    assert abs(r.est_inter - r.exact_inter) <= max(0.35 * r.est_union, 10)
