"""Edge-path coverage for the round-6 operator batches."""

from pyspark.sql import functions as F

from dggstools_spark.operators.flows import od_flows, trip_stats
from dggstools_spark.operators.raster import change_matrix
from dggstools_spark.operators.sketch import hll_distinct
from dggstools_spark.operators.spatial_stats import mean_center
from dggstools_spark.operators.trend import trend_topk_dense


def test_od_flows_all_self_loops(spark):
    rows = [(1, 10, 1, "A"), (1, 20, 2, "A"), (1, 30, 3, "A")]
    df = spark.createDataFrame(rows, "u long, t long, e long, cell string")
    assert od_flows(df, "u", "t", "e", "cell", 10).count() == 0
    t = trip_stats(df, "u", "t", "e", "cell", 10).collect()[0]
    # dwell-only entity: 0 moves, full revisit share of the repeat events
    assert (t.n_moves, t.n_cells, t.revisit_ppm) == (0, 1, 666666)


def test_change_matrix_empty_epoch(spark):
    a = spark.createDataFrame([("c1", 1)], "cellid string, band1 long")
    b = spark.createDataFrame([], "cellid string, band1 long")
    out = change_matrix(a, b, 4).collect()
    assert [(r.class_from, r.class_to, r.n_cells) for r in out] \
        == [(1, -1, 1)]


def test_hll_linear_counting_branch(spark):
    # 3 distinct keys -> tiny E, many zero registers -> the linear
    # counting branch must fire and be exact-ish at small V
    df = spark.createDataFrame([("a", "x"), ("a", "y"), ("a", "z")],
                               "cls string, k string")
    est = hll_distinct(df, "cls", "k").collect()[0].hll_est
    assert est == 3


def test_mean_center_single_point(spark):
    df = spark.createDataFrame([("c", 5.0, -3.0)],
                               "cls string, x double, y double")
    r = mean_center(df, "cls", "x", "y").collect()[0]
    assert (r.n_pts, r.cx_m, r.cy_m, r.std_m) == (1, 5, -3, 0)


def test_dense_trend_single_global_bucket(spark):
    # one global bucket -> T = 1 -> den = 0 -> empty (documented)
    df = spark.createDataFrame([("a", 4, 1), ("b", 4, 9)],
                               "k string, t long, y long")
    assert trend_topk_dense(df, "k", "t", "y", 10).count() == 0


def test_page_rank_two_node_cycle_conserves_mass(spark):
    from dggstools_spark.operators.graph import PPB, page_rank
    edges = [("a", "b", 1), ("b", "a", 1)]
    df = spark.createDataFrame(edges, "s string, d string, w long")
    out = page_rank(df, "s", "d", "w", iters=6).collect()
    # symmetric cycle: both nodes identical, ~PPB/2 each (truncation only)
    ps = sorted(r.p_ppb for r in out)
    assert ps[0] == ps[1]
    assert abs(sum(ps) - PPB) < 100  # < 100 ppb truncation loss


def test_hll_register_merge_equals_one_scan(spark):
    # incremental path: registers of two disjoint scans max-merge into
    # exactly the one-scan union estimate (and hll_registers ->
    # hll_merge_estimate reproduces hll_distinct exactly)
    from dggstools_spark.operators.sketch import (hll_distinct,
                                                  hll_merge_estimate,
                                                  hll_registers)
    rows_a = [("c", f"a-{i}") for i in range(900)]
    rows_b = [("c", f"b-{i}") for i in range(700)] + rows_a[:300]
    a = spark.createDataFrame(rows_a, "cls string, k string")
    b = spark.createDataFrame(rows_b, "cls string, k string")
    u = a.unionByName(b)
    one_scan = hll_distinct(u, "cls", "k").collect()[0].hll_est
    merged = hll_merge_estimate(
        hll_registers(a, "cls", "k").unionByName(
            hll_registers(b, "cls", "k")), "cls").collect()[0].hll_est
    assert merged == one_scan
    direct = hll_merge_estimate(
        hll_registers(u, "cls", "k"), "cls").collect()[0].hll_est
    assert direct == one_scan


def test_cost_distance_matches_dijkstra(spark):
    import heapq

    from dggstools_spark.operators.graph import cost_distance

    # 5x5 single-face lattice, digit-derived weights, one corner source
    rows = []
    for r in range(5):
        for c in range(5):
            d1 = 3 * (r // 3) + (c // 3)
            d2 = 3 * (r % 3) + (c % 3)
            rows.append((f"Q{d1}{d2}", r, c, 1 + (r * 2 + c) % 5))
    cells = spark.createDataFrame(
        [(cid, w) for cid, r, c, w in rows], "cellid string, w long")
    srcs = spark.createDataFrame([("Q00",)], "cellid string")
    got = {x.cellid: x.dist
           for x in cost_distance(cells, 2, srcs, 30).collect()}

    wmap = {(r, c): w for _, r, c, w in rows}
    idmap = {(r, c): cid for cid, r, c, _ in rows}
    dist = {(0, 0): 0}
    pq = [(0, (0, 0))]
    while pq:
        d, (r, c) = heapq.heappop(pq)
        if d > dist.get((r, c), 1 << 60):
            continue
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                n = (r + dr, c + dc)
                if (dr or dc) and n in wmap:
                    nd = d + wmap[n]
                    if nd < dist.get(n, 1 << 60):
                        dist[n] = nd
                        heapq.heappush(pq, (nd, n))
    exp = {idmap[k]: v for k, v in dist.items()}
    assert got == exp
    # barrier: removing the center column splits reachability
    cells2 = cells.filter("cellid NOT IN ('" + "', '".join(
        idmap[(r, 2)] for r in range(5)) + "')")
    got2 = {x.cellid: x.dist
            for x in cost_distance(cells2, 2, srcs, 30).collect()}
    assert all(int(cid[1]) % 3 * 0 == 0 for cid in got2)  # sanity
    right_side = {idmap[(r, c)] for r in range(5) for c in (3, 4)}
    assert not (set(got2) & right_side)  # unreachable across the barrier


def test_bloom_one_sided_and_effective(spark):
    from dggstools_spark.operators.sketch import bloom_build, bloom_probe

    a = spark.createDataFrame([(f"in-{i}",) for i in range(2000)],
                              "key string")
    b = spark.createDataFrame(
        [(f"in-{i}",) for i in range(0, 2000, 4)]      # 500 members
        + [(f"out-{i}",) for i in range(3000)],        # 3000 absent
        "key string")
    filt = bloom_build(a, "key")
    out = {r.key: r.maybe for r in bloom_probe(b, filt, "key").collect()}
    # one-sided: EVERY true member passes
    assert all(out[f"in-{i}"] == 1 for i in range(0, 2000, 4))
    # effective: the vast majority of absent keys are provably dropped
    fp = sum(out[f"out-{i}"] for i in range(3000))
    assert fp < 300  # expected ~ (1 - e^(-4*2000/131072))^4 * 3000 ~ 0


def test_morphology_dilate_erode(spark):
    from dggstools_spark.operators.spatial_stats import (dilate_cells,
                                                         erode_cells)

    # full face Q at res 1 plus one isolated cell on face O
    q_cells = [f"Q{d}" for d in "012345678"]
    cells = spark.createDataFrame([(c,) for c in q_cells + ["O4"]],
                                  "cellid string")
    # cross_face=False: every Q cell's (smaller) in-face neighborhood is
    # complete, so the full face survives; the isolated O4 erodes away
    er_in = {r.cellid for r in erode_cells(cells, 1, cross_face=False)
             .collect()}
    assert er_in == set(q_cells)
    # cross_face=True: edge cells' seam neighbors are absent -> only the
    # face center keeps its full grid neighborhood
    er = {r.cellid for r in erode_cells(cells, 1, cross_face=True)
          .collect()}
    assert er == {"Q4"}
    dl = {r.cellid for r in
          dilate_cells(spark.createDataFrame([("Q4",)], "cellid string"),
                       1, cross_face=False).collect()}
    assert dl == set(q_cells)  # center + ring = the whole face
    # closing the full face keeps it intact (interior semantics)
    close = {r.cellid for r in erode_cells(
        dilate_cells(cells.filter("cellid LIKE 'Q%'"), 1,
                     cross_face=True), 1, cross_face=True).collect()}
    assert set(q_cells) <= close


def test_cm_sketch_overestimates_exactly_bounded(spark):
    from dggstools_spark.operators.dedup import tokens  # noqa: F401
    from dggstools_spark.operators.sketch import cm_build, cm_estimate

    rows = [(f"k{i % 50}",) for i in range(5000)]  # 50 keys x 100
    df = spark.createDataFrame(rows, "key string")
    sk = cm_build(df, "key")
    probes = spark.createDataFrame(
        [(f"k{i}",) for i in range(50)] + [("absent",)], "key string")
    out = {r.key: r.cm_est for r in
           cm_estimate(probes, sk, "key").collect()}
    assert all(out[f"k{i}"] >= 100 for i in range(50))  # one-sided
    assert sum(out[f"k{i}"] for i in range(50)) < 50 * 100 * 1.2
    assert out["absent"] >= 0  # min over empty buckets -> likely 0


def test_region_group_components(spark):
    # two L-shaped clumps on face Q (res 1) + one isolated cell on O
    from dggstools_spark.operators.dedup import dedup_clusters
    from dggstools_spark.operators.spatial_stats import cell_neighbors
    from pyspark.sql import functions as F2

    cells = spark.createDataFrame(
        [("Q0",), ("Q1",), ("Q3",),   # clump A (0-1 row adj, 0-3 col adj)
         ("Q8",),                      # corner, isolated within face...
         ("O4",)], "cellid string")
    mask = cells
    pairs = (cell_neighbors(mask, 1, cross_face=False)
             .join(mask.select(F2.col("cellid").alias("nbr")), "nbr")
             .select(F2.col("cellid").alias("a_id"),
                     F2.col("nbr").alias("b_id")))
    cc = dedup_clusters(pairs, node_col="cellid", cluster_col="region")
    labeled = {r.cellid: r.region for r in
               (mask.join(cc, "cellid", "left")
                .select("cellid", F2.coalesce("region", F2.col("cellid"))
                        .alias("region"))).collect()}
    assert labeled["Q0"] == labeled["Q1"] == labeled["Q3"] == "Q0"
    # Q8 is diagonal to Q4 (absent) — isolated; queen-adjacent to Q5/Q7
    # (absent) too -> own region; O4 likewise
    assert labeled["Q8"] == "Q8" and labeled["O4"] == "O4"


def test_asof_join_semantics(spark):
    from dggstools_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 5, "e2"), (1, 3, "e3"), (2, 7, "e4")],
        "k long, t long, tag string")
    right = spark.createDataFrame(
        [(1, 10, 100), (1, 4, 40), (2, 9, 90)],
        "k long, rt long, v long")
    out = {r.tag: (r.matched_t, r.v) for r in
           asof_join(left, right, "k", "t", "rt", ["v"]).collect()}
    assert out["e1"] == (10, 100)   # equal timestamp matches (inclusive)
    assert out["e2"] == (4, 40)     # latest <= 5
    assert out["e3"] == (None, None)  # nothing at or before 3
    assert out["e4"] == (None, None)  # right exists only later
    # tolerance nulls out stale matches
    out2 = {r.tag: r.v for r in
            asof_join(left, right, "k", "t", "rt", ["v"],
                      tolerance=0).collect()}
    assert out2["e1"] == 100 and out2["e2"] is None
    # duplicate right rows per (k, t) are refused loudly
    dup = right.union(spark.createDataFrame([(1, 4, 41)],
                                            "k long, rt long, v long"))
    try:
        asof_join(left, dup, "k", "t", "rt", ["v"])
        assert False
    except ValueError as e:
        assert "duplicate" in str(e)


def test_range_join_matches_brute_force(spark):
    import random

    from dggstools_spark.operators.temporal import range_join

    rnd = random.Random(5)
    pts = [(i % 3, i, rnd.randrange(0, 10000)) for i in range(300)]
    ivs = [(j, j % 3, s := rnd.randrange(0, 9000), s + rnd.randrange(0, 900))
           for j in range(40)]
    p = spark.createDataFrame(pts, "k long, pid long, t long")
    iv = spark.createDataFrame(ivs, "iid long, k long, s long, e long")
    got = {(r.pid, r.iid) for r in
           range_join(p, iv, "t", "s", "e", 100, key="k").collect()}
    exp = {(pid, iid) for k, pid, t in pts
           for iid, ik, s, e in ivs if ik == k and s <= t <= e}
    assert got == exp and len(exp) > 100
    # guard: a huge span at tiny granularity is refused loudly
    try:
        range_join(p, iv, "t", "s", "e", 1, key="k",
                   max_buckets_per_interval=8)
        assert False
    except ValueError as ex:
        assert "buckets" in str(ex)


def test_page_rank_state_path_matches_checkpoint(spark, tmp_path):
    # TODO_r7 #9: the parquet iteration sink only cuts lineage — values
    # must be bit-identical to the localCheckpoint path
    from dggstools_spark.operators.graph import page_rank
    edges = [("a", "b", 3), ("b", "c", 2), ("c", "a", 1), ("a", "c", 5)]
    df = spark.createDataFrame(edges, "s string, d string, w long")
    mem = sorted((r.node, r.p_ppb, r.rank)
                 for r in page_rank(df, "s", "d", "w", iters=4).collect())
    disk_df = page_rank(df, "s", "d", "w", iters=4,
                        state_path=str(tmp_path / "pr_state"))
    disk = sorted((r.node, r.p_ppb, r.rank) for r in disk_df.collect())
    assert mem == disk
    # the final vector really is parquet-backed (scan in the plan)
    assert "iter1" in disk_df.inputFiles()[0]
