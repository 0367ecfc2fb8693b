"""Round-6 batch 24: dense trend, OD flows, cell neighbors, PQ SemDeDup."""

import numpy as np

from dggstools_spark.operators.flows import od_flows
from dggstools_spark.operators.spatial_stats import cell_neighbors
from dggstools_spark.operators.trend import trend_topk_dense


def test_dense_trend_closed_form(spark):
    # global range t=0..4 (T=5, S1=10, S2=30, den=5*30-100=50).
    # 'up': observed y=t at t=0..4 (dense = observed): num=5*30-10*10=50
    #   -> slope 1.0; 'burst': y=6 at t=0 only -> dense series
    #   (6,0,0,0,0): num=5*0-10*6=-60 -> slope -60/50 = -1.2 -> ppm
    #   -1_200_000 — a DECAYING key that trend_topk would EXCLUDE
    #   (single bucket, den=0).
    rows = ([("up", t, t) for t in range(5)] + [("burst", 0, 6)])
    df = spark.createDataFrame(rows, "k string, t long, y long")
    out = {r.k: r for r in trend_topk_dense(df, "k", "t", "y", 10).collect()}
    assert set(out) == {"up", "burst"}
    assert out["up"].slope_ppm == 1_000_000
    assert out["burst"].slope_ppm == -1_200_000
    assert out["up"].n_buckets == 5 and out["burst"].n_buckets == 5
    assert out["up"].n_obs == 5 and out["burst"].n_obs == 1
    assert out["up"].rank == 1


def test_dense_trend_matches_explicit_zero_fill(spark):
    # the closed form must equal trend_topk over an explicitly
    # zero-filled frame (shifted, gappy bucket range 3..9)
    rows = [("a", 3, 5), ("a", 7, 2), ("b", 4, 1), ("b", 9, 8),
            ("c", 6, 4)]
    df = spark.createDataFrame(rows, "k string, t long, y long")
    dense = {r.k: r for r in
             trend_topk_dense(df, "k", "t", "y", 10).collect()}
    from dggstools_spark.operators.trend import trend_topk
    filled = [(k, t, dict((tt, y) for kk, tt, y in rows if kk == k)
               .get(t, 0)) for k in "abc" for t in range(3, 10)]
    df2 = spark.createDataFrame(filled, "k string, t long, y long")
    explicit = {r.k: r for r in
                trend_topk(df2, "k", "t", "y", 10).collect()}
    assert set(dense) == set(explicit)
    for k in dense:
        assert dense[k].slope_num == explicit[k].slope_num, k
        assert dense[k].slope_den == explicit[k].slope_den, k
        assert dense[k].slope_ppm == explicit[k].slope_ppm, k
        assert dense[k].rank == explicit[k].rank, k


def test_od_flows_semantics(spark):
    # u1: A->B->B->C  => moves A->B, B->C (self-loop B->B excluded)
    # u2: A->B        => move A->B (corridor A->B: 2 moves, 2 movers)
    # u3: single event => no move
    # tie discipline: u4 has two events at the SAME ts — order falls to
    # the event id, so the move is X->Y (id 1 then id 2), never Y->X.
    rows = [(1, 10, 1, "A"), (1, 20, 2, "B"), (1, 30, 3, "B"),
            (1, 40, 4, "C"),
            (2, 10, 5, "A"), (2, 15, 6, "B"),
            (3, 99, 7, "Z"),
            (4, 50, 8, "X"), (4, 50, 9, "Y")]
    df = spark.createDataFrame(rows, "u long, t long, e long, cell string")
    out = od_flows(df, "u", "t", "e", "cell", 10).collect()
    by_od = {(r.o_cell, r.d_cell): r for r in out}
    assert set(by_od) == {("A", "B"), ("B", "C"), ("X", "Y")}
    ab = by_od[("A", "B")]
    assert (ab.n_moves, ab.n_entities, ab.rank) == (2, 2, 1)
    assert by_od[("B", "C")].n_moves == 1
    assert by_od[("X", "Y")].n_moves == 1
    # deterministic tie ranking: (n_moves desc, o, d)
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3]
    assert by_od[("B", "C")].rank == 2  # 'B' < 'X'


def _all_cells(res):
    from itertools import product
    out = []
    for f in "NOPQRS":
        for combo in product("012345678", repeat=res):
            out.append(f + "".join(combo))
    return out


def test_cell_neighbors_full_sphere(spark):
    # complete res-1 lattice: 54 cells; queen adjacency closed across
    # the cube gluing gives 8 neighbors everywhere except the 24 corner
    # cells (7 — no across-corner diagonal on a cube).
    cells = spark.createDataFrame([(c,) for c in _all_cells(1)],
                                  "cellid string")
    pairs = cell_neighbors(cells, 1, cross_face=True).collect()
    by_cell = {}
    seen = set()
    for r in pairs:
        assert r.cellid != r.nbr
        assert (r.cellid, r.nbr) not in seen, "duplicate pair"
        seen.add((r.cellid, r.nbr))
        by_cell.setdefault(r.cellid, []).append(r.nbr)
    counts = sorted(len(v) for v in by_cell.values())
    assert counts.count(7) == 24 and counts.count(8) == 30
    # adjacency is symmetric
    for a, b in seen:
        assert (b, a) in seen, (a, b)
    # interior-only mode: the center cell of each face keeps 8, corners 3
    pairs_in = cell_neighbors(cells, 1, cross_face=False).collect()
    by_in = {}
    for r in pairs_in:
        assert r.across == 0
        by_in.setdefault(r.cellid, []).append(r.nbr)
    c_in = sorted(len(v) for v in by_in.values())
    assert c_in.count(3) == 24 and c_in.count(5) == 24 and c_in.count(8) == 6


def test_cell_neighbors_matches_geodesy(spark):
    # every cross-face neighbor must be geodesically CLOSE: centroid
    # distance under ~2 cell widths at that res (seam gluing sanity
    # against the kernel, independent of the topology derivation).
    from dggstools_spark.dggs.cells import cellid_to_lonlat_centroid
    from dggstools_spark.dggs.config import AUTHALIC_RADIUS

    cells = spark.createDataFrame([(c,) for c in _all_cells(1)],
                                  "cellid string")
    x = cell_neighbors(cells, 1, cross_face=True) \
        .filter("across = 1").collect()
    assert x, "no cross-face pairs at res 1?"
    lo1, la1 = cellid_to_lonlat_centroid(np.array([r.cellid for r in x]))
    lo2, la2 = cellid_to_lonlat_centroid(np.array([r.nbr for r in x]))
    lon1, lat1 = np.radians(lo1), np.radians(la1)
    lon2, lat2 = np.radians(lo2), np.radians(la2)
    d = AUTHALIC_RADIUS * 2 * np.arcsin(np.sqrt(
        np.sin((lat2 - lat1) / 2) ** 2
        + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2))
    cell_w = AUTHALIC_RADIUS * np.pi / 2 / 3  # quad width / 3^res
    assert float(d.max()) < 2.5 * cell_w


def test_semantic_pq_schema_and_keep_rule(spark):
    from dggstools_spark.operators.semdedup import (semantic_dedup,
                                                    semantic_dedup_pq)

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(120, 64)).astype("float32")
    rows = [(int(i), [float(v) for v in vecs[i]]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup_pq(df, 0.2, dim=64).collect()
    assert {c for c in out[0].asDict()} == {
        "cid", "n_docs", "n_dropped", "kept_id_sum"}
    # clusters partition the corpus; every cluster keeps >= 1 (the min-id
    # member never has a smaller-id neighbor)
    assert sum(r.n_docs for r in out) == 120
    assert all(r.n_docs - r.n_dropped >= 1 for r in out)
    # same report semantics as the exact-assign twin: total corpus mass
    # is identical even where cluster boundaries differ
    exact = semantic_dedup(df, 0.2, dim=64).collect()
    assert sum(r.n_docs for r in exact) == 120
