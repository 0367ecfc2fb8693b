"""Operator-level tests: spatial joins, AUID compaction, dedup, raster ops."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dggstools_spark.dggs import auids as auids_core
from dggstools_spark.dggs.cells import HALF_SIDE
from dggstools_spark.operators import auid as auid_ops
from dggstools_spark.operators import dedup, raster, spatial_join


# --------------------------------------------------------------------------
# J2 point-in-polygon
# --------------------------------------------------------------------------

def _square_poly(spark, poly_id, x0, y0, side):
    ring = [{"x": x0, "y": y0}, {"x": x0 + side, "y": y0},
            {"x": x0 + side, "y": y0 + side}, {"x": x0, "y": y0 + side}]
    return spark.createDataFrame(
        [(poly_id, ring)], "poly_id int, ring array<struct<x double, y double>>")


def test_points_in_polygons_square(spark):
    polys = _square_poly(spark, 1, 0.0, 0.0, 10.0)
    pts = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 9.99, 0.01), (3, 10.01, 5.0), (4, -0.01, 5.0), (5, 5.0, 11.0)],
        "pid int, px double, py double")
    got = spatial_join.points_in_polygons(pts, polys)
    inside = {r.pid for r in got.collect()}
    assert inside == {1, 2}


def test_points_in_polygons_lshape(spark):
    # L-shape: unit square minus its top-right quadrant
    ring = [{"x": 0.0, "y": 0.0}, {"x": 2.0, "y": 0.0}, {"x": 2.0, "y": 1.0},
            {"x": 1.0, "y": 1.0}, {"x": 1.0, "y": 2.0}, {"x": 0.0, "y": 2.0}]
    polys = spark.createDataFrame([(7, ring)], "poly_id int, ring array<struct<x double, y double>>")
    pts = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 1.5, 0.5), (3, 0.5, 1.5), (4, 1.5, 1.5)],
        "pid int, px double, py double")
    got = {r.pid for r in spatial_join.points_in_polygons(pts, polys).collect()}
    assert got == {1, 2, 3}


def test_rasterize_polygons_center_burn(spark):
    # square covering exactly a 3x3 block of res-2 cells on face Q:
    # Q face ul = (0, s/2); pick cells rows 2..4, cols 1..3 at res 2 (w = s/9)
    w = HALF_SIDE / 9
    x0, x1 = 1 * w, 4 * w
    y1, y0 = HALF_SIDE / 2 - 2 * w, HALF_SIDE / 2 - 5 * w
    ring = [{"x": x0, "y": y0}, {"x": x1, "y": y0}, {"x": x1, "y": y1}, {"x": x0, "y": y1}]
    polys = spark.createDataFrame([(1, ring)], "poly_id int, ring array<struct<x double, y double>>")
    cells = spatial_join.rasterize_polygons(polys, 2)
    got = sorted(r.cellid for r in cells.collect())
    assert len(got) == 9
    assert all(c.startswith("Q") for c in got)
    # verify against the kernel: all cell centers must be inside the box
    from dggstools_spark.dggs.cells import cellid_to_planar_centroid

    cx, cy = cellid_to_planar_centroid(got)
    assert ((cx > x0) & (cx < x1) & (cy > y0) & (cy < y1)).all()


def test_pip_join_assigns_docs(spark):
    from dggstools_spark.sources.synth import interleaved_docs
    from dggstools_spark.functions.encode import planar_from_lonlat_udf

    docs = interleaved_docs(spark, 400, 4)
    # polygon = big square over part of the equatorial band (planar meters)
    s = HALF_SIDE
    ring = [{"x": -s, "y": -0.4 * s}, {"x": 0.0, "y": -0.4 * s},
            {"x": 0.0, "y": 0.4 * s}, {"x": -s, "y": 0.4 * s}]
    polys = spark.createDataFrame([(1, ring)], "poly_id int, ring array<struct<x double, y double>>")
    joined = spatial_join.pip_join(docs, polys, res=3)
    # every joined doc's planar position must be in the polygon's cell cover;
    # sanity: all assigned docs' planar coords are within the box extended by
    # one cell width (center-burn boundary effect)
    fwd = planar_from_lonlat_udf()
    got = joined.withColumn("p", fwd("lon", "lat")).select("doc_id", "p.x", "p.y").collect()
    assert len(got) > 0
    wcell = HALF_SIDE / 27
    for r in got:
        assert -s - wcell <= r.x <= 0 + wcell
        assert -0.4 * s - wcell <= r.y <= 0.4 * s + wcell


# --------------------------------------------------------------------------
# J5 kNN
# --------------------------------------------------------------------------

def test_knn_pruned_matches_exact(spark):
    rng = np.random.default_rng(3)
    pts = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in
         enumerate(zip(rng.uniform(0, 1e6, 2000), rng.uniform(0, 1e6, 2000)))],
        "pid long, px double, py double")
    qs = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in
         enumerate(zip(rng.uniform(2e5, 8e5, 10), rng.uniform(2e5, 8e5, 10)))],
        "q_id long, qx double, qy double")
    exact = spatial_join.knn_join_exact(pts, qs, 5).select("q_id", "pid", "rank")
    pruned = spatial_join.knn_join_pruned(pts, qs, 5, block_res=4) \
        .select("q_id", "pid", "rank")
    e = {(r.q_id, r.pid, r.rank) for r in exact.collect()}
    p = {(r.q_id, r.pid, r.rank) for r in pruned.collect()}
    assert e == p


def test_knn_pruned_sparse_region_expands_not_crossjoins(spark):
    """Queries far from every point must resolve by level expansion — the
    plan may NOT contain a cartesian/nested-loop join of the full point
    table (the round-1 scale-killer)."""
    rng = np.random.default_rng(9)
    # dense cluster near the origin, queries ~1e6 m away (many block widths
    # at block_res=4 where w ~ 1.2e5 m)
    pts = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in
         enumerate(zip(rng.uniform(0, 1e5, 500), rng.uniform(0, 1e5, 500)))],
        "pid long, px double, py double")
    qs = spark.createDataFrame(
        [(0, 9.0e5, 9.0e5), (1, -8.0e5, 4.0e5), (2, 5.0e4, 5.0e4)],
        "q_id long, qx double, qy double")
    exact = spatial_join.knn_join_exact(pts, qs, 4).select("q_id", "pid", "rank")
    pruned = spatial_join.knn_join_pruned(pts, qs, 4, block_res=4)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    e = {(r.q_id, r.pid, r.rank) for r in exact.collect()}
    p = {(r.q_id, r.pid, r.rank) for r in pruned.select("q_id", "pid", "rank").collect()}
    assert e == p


def test_knn_pruned_fewer_points_than_k(spark):
    """Fewer than k points globally: the bounded last-resort exact join for
    the unresolved queries returns all points, matching exact semantics."""
    pts = spark.createDataFrame(
        [(1, 10.0, 10.0), (2, 2.0e6, 1.0e6)], "pid long, px double, py double")
    qs = spark.createDataFrame([(0, 0.0, 0.0)], "q_id long, qx double, qy double")
    exact = spatial_join.knn_join_exact(pts, qs, 5).select("q_id", "pid", "rank")
    pruned = spatial_join.knn_join_pruned(pts, qs, 5, block_res=4) \
        .select("q_id", "pid", "rank")
    assert ({tuple(r) for r in exact.collect()}
            == {tuple(r) for r in pruned.collect()})


# --------------------------------------------------------------------------
# A9 distributed compaction
# --------------------------------------------------------------------------

GOLDEN_SETS = [
    (["N11", "N11", "N12", "N21", "N22", "N23", "N24"], 2),
    (["N11", "N12", "N2", "N31", "N32", "N33", "N341", "N342", "N343"], 2),
    (["R11", "R12", "R13", "R141", "R142", "R143", "R144"], 2),
    (["N1", "N2", "N3", "N4", "S", "O", "Q"], 2),
    (["R11", "R12", "R13", "R14", "R15", "R16", "R17", "R18", "R19"], 3),
]


def test_optimize_cells_matches_kernel(spark):
    for cuids, n_side in GOLDEN_SETS:
        df = spark.createDataFrame([(c,) for c in cuids], "cellid string")
        got = sorted(r.cellid for r in auid_ops.optimize_cells(df, n_side).collect())
        want = auids_core.optimize_cuids(cuids, n_side)
        assert got == want, (cuids, got, want)


def test_optimize_cells_random_equivalence(spark):
    rng = np.random.default_rng(5)
    for n_side in (2, 3):
        k = n_side * n_side
        cuids = []
        for _ in range(300):
            depth = rng.integers(1, 4)
            cid = "NOPQRS"[rng.integers(0, 6)] + "".join(
                str(rng.integers(0, k)) for _ in range(depth))
            cuids.append(cid)
        df = spark.createDataFrame([(c,) for c in cuids], "cellid string")
        got = sorted(r.cellid for r in auid_ops.optimize_cells(df, n_side).collect())
        want = auids_core.optimize_cuids(cuids, n_side)
        assert got == want


def test_auid_per_group(spark):
    df = spark.createDataFrame(
        [("a", "N11"), ("a", "N12"), ("a", "N2"), ("b", "S1"), ("b", "S1")],
        "g string, cellid string")
    out = {r.group_key: r.auid_b64 for r in
           auid_ops.auid_per_group(df, "g").collect()}
    assert out["a"] == auids_core.generate_auid_hash_b64(["N11", "N12", "N2"])[0]
    assert out["b"] == auids_core.generate_auid_hash_b64(["S1"])[0]


# --------------------------------------------------------------------------
# dedup
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def dup_corpus(spark):
    rows = []
    for i in range(40):
        base = f"alpha beta gamma delta epsilon zeta eta theta doc{i // 2}"
        rows.append((i, base))  # pairs 0/1, 2/3, ... share text
    rows.append((100, "totally different content with no overlap whatsoever xyzzy"))
    return spark.createDataFrame(rows, "id long, text string")


def test_exact_dedup(dup_corpus):
    groups = dedup.exact_dedup(dup_corpus, "text", "id")
    sizes = sorted(r.n_docs for r in groups.collect())
    assert sizes == [1] + [2] * 20


def test_minhash_lsh_finds_dups(dup_corpus):
    pairs = {(r.a_id, r.b_id) for r in
             dedup.minhash_lsh_pairs(dup_corpus, "text", "id").collect()}
    for i in range(0, 40, 2):
        assert (i, i + 1) in pairs  # identical docs always collide
    assert not any(100 in p for p in pairs)


def test_ngram_jaccard(dup_corpus):
    pairs = dedup.ngram_jaccard_pairs(dup_corpus, "text", "id", threshold=0.99)
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    assert got == {(i, i + 1) for i in range(0, 40, 2)}


def test_simhash_identical_docs_equal(dup_corpus):
    sh = dedup.simhash(dup_corpus, "text", "id")
    vals = {r.id: r.simhash64 for r in sh.collect()}
    for i in range(0, 40, 2):
        assert vals[i] == vals[i + 1]


def test_simhash_relational_equals_pandas(spark, dup_corpus):
    """The JVM-side relational simhash (the 100-TB path) is bit-identical
    to the original Arrow-UDF construction, including empty/null texts and
    multi-space token edge cases."""
    edge = spark.createDataFrame(
        [(200, ""), (201, None), (202, "one"), (203, "a  b"),
         (204, " leading"), (205, "trailing ")],
        "id long, text string")
    df = dup_corpus.unionByName(edge)
    rel = {r.id: r.simhash64
           for r in dedup.simhash(df, "text", "id", impl="relational").collect()}
    pdu = {r.id: r.simhash64
           for r in dedup.simhash(df, "text", "id", impl="pandas").collect()}
    assert rel == pdu
    assert rel[200] == 0 and rel[201] == 0


def test_dedup_clusters_components(spark):
    """Connected components over a pair graph: long chains (diameter >> 1),
    multiple components, and a singleton edge all collapse to min-member
    cluster ids, matching a direct union-find reference."""
    chain = [(i, i + 1) for i in range(100, 300)]  # path: diameter 200 —
    # proves the pointer-jump O(log d) convergence (neighbor-only
    # propagation would need 200 rounds, over max_iters=30)
    clique = [(a, b) for a in range(30, 34) for b in range(a + 1, 34)]
    extra = [(50, 51)]
    pairs = spark.createDataFrame(chain + clique + extra, "a_id long, b_id long")
    got = {r.doc_id: r.cluster_id
           for r in dedup.dedup_clusters(pairs).collect()}

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in chain + clique + extra:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want
    assert got[299] == 100 and got[33] == 30 and got[51] == 50


def test_embedding_cosine_pairs(spark):
    rng = np.random.default_rng(8)
    base = rng.normal(size=16)
    rows = []
    for i in range(10):
        v = base + rng.normal(scale=0.01, size=16)  # near-dups of base
        rows.append((i, [float(x) for x in v]))
    for i in range(10, 20):
        rows.append((i, [float(x) for x in rng.normal(size=16)]))
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    pairs = dedup.embedding_cosine_pairs(df, "vec", "id", threshold=0.99)
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    # all near-dup pairs found, no false positives among randoms
    assert all(a < 10 and b < 10 for a, b in got)
    assert len(got) >= 30  # most of the 45 near-dup pairs collide in >=1 bucket


# --------------------------------------------------------------------------
# raster ops
# --------------------------------------------------------------------------

def test_tiles_cells_roundtrip(spark):
    rows = [("Q", r, c, float(r * 100 + c)) for r in range(9) for c in range(9)]
    tiles = spark.createDataFrame(rows, "face string, row long, col long, band1 double")
    cells = raster.tiles_to_cells(tiles, res=2, nodata=-9999.0)
    assert cells.count() == 81
    back = raster.cells_to_tiles(cells.select("cellid", "band1"))
    got = {(r.face, r.row, r.col): r.band1 for r in back.collect()}
    assert got == {(f, r, c): v for f, r, c, v in rows}


def test_nodata_filter(spark):
    rows = [("Q", 0, 0, -9999.0), ("Q", 0, 1, 5.0)]
    tiles = spark.createDataFrame(rows, "face string, row long, col long, band1 double")
    cells = raster.tiles_to_cells(tiles, res=1, nodata=-9999.0)
    assert cells.count() == 1
    cells_all = raster.tiles_to_cells(tiles, res=1, nodata=-9999.0, store_nodata=True)
    assert cells_all.count() == 2


def test_assemble_tile_arrays(spark):
    rows = [("Q", r, c, float(r * 10 + c)) for r in range(3) for c in range(3)]
    tiles = spark.createDataFrame(rows, "face string, row long, col long, band1 double")
    cells = raster.tiles_to_cells(tiles, res=1)
    tile_rows = raster.cells_to_tiles(cells.select("cellid", "band1"), tile_prefix_len=1)
    arrays = raster.assemble_tile_arrays(tile_rows, res=1, tile_col="tile").collect()
    assert len(arrays) == 1
    a = arrays[0]
    assert a.height == 3 and a.width == 3
    assert a.data[1][2] == 12.0


def test_rescale_and_explode(spark):
    rows = [(f"Q{d}", float(d)) for d in range(9)]
    cells = spark.createDataFrame(rows, "cellid string, band1 double")
    up = raster.rescale_to_parent(cells, 1, agg="avg")
    got = up.collect()
    assert len(got) == 1 and got[0].cellid == "Q" and got[0].band1 == 4.0
    down = raster.explode_to_children(up, 1, 3)
    assert down.count() == 9
    first = raster.rescale_to_parent(cells, 1, agg="first").collect()[0]
    assert first.band1 == 0.0  # value of child Q0
    mode = raster.rescale_to_parent(
        spark.createDataFrame([("Q0", 1.0), ("Q1", 1.0), ("Q2", 2.0)],
                              "cellid string, band1 double"), 1, agg="mode").collect()[0]
    assert mode.band1 == 1.0


def test_grid_and_merge(spark):
    g = raster.grid(spark, 1, faces="Q")
    rows = g.collect()
    assert len(rows) == 9
    ids = sorted(r.cellid for r in rows)
    assert ids == [f"Q{i}" for i in range(9)]
    existing = spark.createDataFrame([("Q0", 1.0), ("Q1", 2.0)], "cellid string, band1 double")
    updates = spark.createDataFrame([("Q1", 9.0), ("Q2", 3.0)], "cellid string, band1 double")
    merged = {r.cellid: r.band1 for r in raster.merge_cells(existing, updates).collect()}
    assert merged == {"Q0": 1.0, "Q1": 9.0, "Q2": 3.0}


def test_is_optimal_single_pass(spark):
    """Distributed A10 agrees with the kernel on the golden sets, without
    running the fixpoint."""
    for cuids, n_side in GOLDEN_SETS:
        df = spark.createDataFrame([(c,) for c in cuids], "cellid string")
        assert auid_ops.is_optimal(df, n_side) == auids_core.is_optimal_cuids(cuids, n_side)
    # an optimized random set is optimal; the raw set (usually) is not
    rng = np.random.default_rng(11)
    cuids = ["NOPQRS"[rng.integers(0, 6)] + "".join(str(rng.integers(0, 9)) for _ in range(int(rng.integers(1, 4))))
             for _ in range(200)]
    opt = auids_core.optimize_cuids(cuids, 3)
    df_opt = spark.createDataFrame([(c,) for c in opt], "cellid string")
    assert auid_ops.is_optimal(df_opt, 3)
    df_raw = spark.createDataFrame([(c,) for c in cuids], "cellid string")
    assert auid_ops.is_optimal(df_raw, 3) == auids_core.is_optimal_cuids(cuids, 3)


def test_tile_key_expr_sentinel_and_exactness(spark):
    """tile_key_expr: -1 off-cube passes through; coarsening matches the
    numpy kernel's pack at the tile resolution (integer div, no fp rounding)."""
    from dggstools_spark.dggs import cells as kcells
    from dggstools_spark.functions.encode import tile_key_expr

    res, tile_res = 9, 3
    rng = np.random.default_rng(7)
    lon = rng.uniform(-179, 179, 500)
    lat = rng.uniform(-89, 89, 500)
    keys = kcells.lonlat_to_cellkey(lon, lat, res)
    want = kcells.lonlat_to_cellkey(lon, lat, tile_res)
    df = spark.createDataFrame([(int(k),) for k in keys] + [(-1,)], "ck bigint")
    got = df.select(tile_key_expr("ck", res, tile_res).alias("tk")).collect()
    got_vals = [r.tk for r in got]
    assert got_vals[-1] == -1
    assert got_vals[:-1] == [int(w) for w in want]
    with pytest.raises(ValueError):
        tile_key_expr("ck", 16, 3)


def test_hot_bucket_guard_bounds_skewed_lsh(spark):
    """Skew fixture: thousands of docs sharing one band (boilerplate) are
    dropped by the cap instead of exploding the self-join quadratically;
    genuine small dup groups still pair, and dropped mass is reported."""
    rows = [(i, "the same boilerplate header repeated everywhere forever") for i in range(3000)]
    rows += [(10000 + i, f"unique interesting document body number {i // 2} tail") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, text string")
    pairs = dedup.minhash_lsh_pairs(df, "text", "id", max_bucket=100)
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    # boilerplate buckets (3000 >> cap) contribute no pairs
    assert not any(a < 10000 for a, _ in got)
    # the 10 small dup pairs survive
    for i in range(0, 20, 2):
        assert (10000 + i, 10000 + i + 1) in got
    dropped = dedup.hot_bucket_stats(
        dedup.lsh_bands(df, "text", "id"), "band_key", 100).collect()
    assert len(dropped) >= 1  # one row per dropped band key
    assert sum(r.n_rows for r in dropped) >= 3000


def test_ngram_jaccard_doc_freq_cap(spark):
    """A stop-shingle present in every doc is excluded from the pair join by
    max_doc_freq; pairs that share only the stop-shingle disappear, while
    real near-dups (sharing rare shingles) keep their Jaccard unchanged."""
    rows = [(i, f"common stop shingle word{i} alpha{i} beta{i}") for i in range(200)]
    rows += [(1000, "rare one two three four five"), (1001, "rare one two three four six")]
    df = spark.createDataFrame(rows, "id long, text string")
    capped = dedup.ngram_jaccard_pairs(df, "text", "id", threshold=0.3, max_doc_freq=50)
    got = {(r.a_id, r.b_id) for r in capped.collect()}
    assert (1000, 1001) in got
    assert all(a == 1000 for a, _ in got)
    # uncapped agrees on the surviving pair's value
    uncapped = dedup.ngram_jaccard_pairs(df, "text", "id", threshold=0.3, max_doc_freq=None)
    jac_c = {(r.a_id, r.b_id): r.jac_ppm for r in capped.collect()}
    jac_u = {(r.a_id, r.b_id): r.jac_ppm for r in uncapped.collect()}
    assert jac_c[(1000, 1001)] == jac_u[(1000, 1001)]


def test_ann_topk_recall_and_plan(spark):
    """Bucketed ANN: no cartesian/nested-loop join in the plan, and recall@3
    vs the brute-force exact top-k is usable on the synthetic embeddings
    (multi-probe Hamming<=1 over 8 planes)."""
    from dggstools_spark.operators.similarity import ann_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    approx = ann_topk(emb, qs, 3)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan

    from dggstools_spark.operators.similarity import DOT_SPARK, NRM_SPARK
    from pyspark.sql.window import Window

    pairs = emb.select(F.col("vec_id").alias("cand_id"),
                       F.col("embedding").alias("c_emb")) \
        .crossJoin(F.broadcast(qs)).filter(F.col("cand_id") != F.col("q_id"))
    dot = DOT_SPARK.format(a="q_emb", b="c_emb")
    nrm = NRM_SPARK.format(v="q_emb") + " * " + NRM_SPARK.format(v="c_emb")
    pairs = pairs.withColumn("sim", F.expr(f"round(({dot}) / ({nrm}), 9)"))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("cand_id"))
    exact = pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3)

    got = {(r.q_id, r.vec_id) for r in approx.collect()}
    want = {(r.q_id, r.cand_id) for r in exact.collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.4, f"recall@3 {recall:.2f} too low"


def test_salted_topk_matches_naive(spark):
    """salted_topk_per_key is exact: equals the single-window top-k on a
    skewed fixture (one hot key + uniform tail)."""
    from dggstools_spark.operators.skew import salted_topk_per_key, topk_per_key

    df = (spark.range(20000)
          .select(F.col("id").alias("doc_id"),
                  F.when(F.pmod("id", F.lit(10)) < 9, F.lit(1))
                  .otherwise(F.pmod("id", F.lit(50))).alias("tile"),
                  F.pmod(F.col("id") * 40503, F.lit(99991)).alias("score")))
    order = [F.col("score").desc(), F.col("doc_id")]
    a = {tuple(r) for r in topk_per_key(df, ["tile"], order, 25)
         .select("tile", "doc_id", "rank").collect()}
    b = {tuple(r) for r in salted_topk_per_key(df, ["tile"], order, 25, n_salt=8,
                                               salt_src="doc_id")
         .select("tile", "doc_id", "rank").collect()}
    c = {tuple(r) for r in salted_topk_per_key(df, ["tile"], order, 25, n_salt=8)
         .select("tile", "doc_id", "rank").collect()}
    assert a == b == c and len(a) > 25


def test_points_in_polygons_duplicates_and_shared_columns(spark):
    """Duplicate point rows each report independently (value-grouping would
    double the crossing parity and drop them), and a column name shared with
    the polygon table must not turn ambiguous."""
    polys = _square_poly(spark, 1, 0.0, 0.0, 10.0).withColumn(
        "source", F.lit("polyside"))
    pts = spark.createDataFrame(
        [(1, 5.0, 5.0, "a"), (1, 5.0, 5.0, "a"), (2, 20.0, 20.0, "b")],
        "pid int, px double, py double, source string")
    got = spatial_join.points_in_polygons(pts, polys).collect()
    assert len(got) == 2  # both duplicate copies, not zero
    assert all(r.pid == 1 and r.source == "a" for r in got)


def test_knn_adaptive_block_res_and_stats(spark):
    """block_res=None picks a level from the density pre-pass; results match
    the exact join and last_knn_stats records the expansion profile."""
    import random

    from dggstools_spark.operators import spatial_join

    random.seed(5)
    pts = spark.createDataFrame(
        [(i, random.uniform(0, 5e5), random.uniform(0, 5e5)) for i in range(800)],
        "pid int, px double, py double")
    qs = spark.createDataFrame(
        [(q, random.uniform(0, 5e5), random.uniform(0, 5e5)) for q in range(6)],
        "q_id int, qx double, qy double")
    pruned = spatial_join.knn_join_pruned(pts, qs, 5) \
        .select("q_id", "pid", "rank").collect()
    exact = spatial_join.knn_join_exact(pts, qs, 5) \
        .select("q_id", "pid", "rank").collect()
    assert {tuple(r) for r in pruned} == {tuple(r) for r in exact}
    st = spatial_join.last_knn_stats
    assert st["block_res"] >= 0
    assert sum(st["resolved_per_level"].values()) + st["fallback_n"] == 6


def test_probe_frame_matches_nested_text_probes(spark):
    """The staged-column probe expansion produces exactly the nested-text
    probe set, including at plane counts where the textual form would blow
    up quadratically."""
    from dggstools_spark.operators.similarity import (probe_buckets_sql,
                                                      probe_frame)

    n = 12
    qsig = spark.createDataFrame([(1, "110100101101")], "q_id int, _qb string")
    staged = {r.bucket for r in probe_frame(qsig, n, 2).collect()}
    nested = {r[0] for r in qsig.select(
        F.explode(F.array(*[F.expr(p) for p in probe_buckets_sql("_qb", n, 2)]))
    ).collect()}
    assert staged == nested
    assert len(staged) == 1 + n + n * (n - 1) // 2


def test_area_error_cross_class_overlap_burns_last(spark):
    """A cell covered by polygons of two classes counts ONCE, for the
    last-drawn (highest poly_id) class — raster burn-overwrite semantics."""
    from dggstools_spark.dggs.cells import HALF_SIDE
    from dggstools_spark.operators.metrics import area_error

    s = HALF_SIDE
    # two identical squares on face Q, different classes: burn-last keeps
    # only class 1's cells; 'all' mode double-counts
    ring = [(0.1 * s, 0.1 * s), (0.4 * s, 0.1 * s),
            (0.4 * s, 0.4 * s), (0.1 * s, 0.4 * s)]
    polys = spark.createDataFrame(
        [(0, 0, ring), (1, 1, ring)],
        "poly_id int, class int, ring array<struct<x double, y double>>")
    last = area_error(polys, 3).first()
    both = area_error(polys, 3, overlap="all").first()
    assert abs(both.total_cells_area - 2 * last.total_cells_area) < 1e-6
    # burn-last: class 0 gets zero raster area -> bias is asymmetric
    assert last.total_cells_area > 0


def test_pip_narrow_shuffle_matches_default(spark):
    """narrow_shuffle=True returns the same containment pairs as the
    single-pass aggregate, including duplicate point rows."""
    from dggstools_spark.operators.spatial_join import points_in_polygons

    ring = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
    polys = spark.createDataFrame(
        [(1, ring)], "poly_id int, ring array<struct<x double, y double>>")
    pts = spark.createDataFrame(
        [(1, 5.0, 5.0, "wide1"), (2, 15.0, 5.0, "wide2"),
         (3, 5.0, 5.0, "wide3"), (3, 5.0, 5.0, "wide3")],  # dup row
        "pid int, px double, py double, payload string")
    a = sorted(tuple(r) for r in points_in_polygons(pts, polys).collect())
    b = sorted(tuple(r) for r in
               points_in_polygons(pts, polys, narrow_shuffle=True).collect())
    assert a == b
    assert len(a) == 3  # both copies of the dup row report

    # auto mode (narrow_shuffle=None): schema-only width probe — the wide
    # media/embedding payload flips to the narrow rejoin path, the narrow
    # key table keeps the single-pass plan
    from dggstools_spark.operators.spatial_join import (NARROW_WIDTH_BYTES,
                                                        _est_row_width)
    assert _est_row_width(pts.schema) <= NARROW_WIDTH_BYTES
    wide = pts.withColumn("media", F.col("payload").cast("binary")) \
              .withColumn("embedding", F.array(*[F.col("px")] * 2))
    assert _est_row_width(wide.schema) > NARROW_WIDTH_BYTES
    c = sorted(tuple(r) for r in points_in_polygons(wide, polys)
               .select("pid", "px", "py", "payload", "poly_id").collect())
    assert a == c


def test_winnow_auto_cap_templated_corpus(spark):
    """max_doc_freq='auto' derives the cap from the corpus: on a templated
    corpus the corpus-fraction bound governs, template fingerprints are
    dropped (observable), and a genuine 2-doc copied passage survives."""
    template = ("the quick brown fox jumps over the lazy dog while the band "
                "plays the same old tune once more for everyone ")
    rows = [(i, template + f"unique tail number {i} marker zz{i}q")
            for i in range(60)]
    copied = ("xylophone quartz vermilion buzzard mosaic feather stone "
              "granite lantern whisper")
    rows.append((100, "prefix alpha " + copied))
    rows.append((101, "prefix omega " + copied))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.n_shared
           for r in dedup.winnow_pairs(df, "text").collect()}
    cap = dedup.last_winnow_cap["cap"]
    assert 2 <= cap < 60  # template fps (doc-freq 60) fall above the cap
    assert (100, 101) in got  # the genuine copied passage survives
    # template mass is gone: without the cap every template pair (C(60,2) =
    # 1770) would share the full template fingerprint set; what remains are
    # weak digit-coincidence pairs ("...0 marker..." in docs 0/20/40), each
    # sharing far fewer fingerprints than the real copy
    assert max(got, key=got.get) == (100, 101)
    others = [v for k, v in got.items() if k != (100, 101)]
    assert len(others) < 400
    assert not others or max(others) < got[(100, 101)] / 2


def test_winnow_fingerprints_match_reference(spark):
    """Spark relational winnowing == DuckDB list twin == a direct Python
    implementation of the MOSS scheme, including short-doc edge cases."""
    import duckdb

    from dggstools_spark.functions.text import (WINNOW_B, WINNOW_K, WINNOW_P,
                                                WINNOW_W, winnow_fps_duckdb)
    from dggstools_spark.operators.dedup import winnow_fingerprints

    def py_winnow(t, k=WINNOW_K, w=WINNOW_W):
        t = t.lower()
        if len(t) < k:
            return set()
        hs = []
        for i in range(len(t) - k + 1):
            acc = ord(t[i])
            for j in range(1, k):
                acc = (acc * WINNOW_B + ord(t[i + j])) % WINNOW_P
            hs.append(acc)
        if len(hs) < w:
            return {min(hs)}
        return {min(hs[s:s + w]) for s in range(len(hs) - w + 1)}

    texts = ["Hello World, hello world!", "abc", "", "aaaaaaaaaa",
             "The quick brown fox jumps over the lazy dog", "abcde"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id int, text string")
    got = {}
    for r in winnow_fingerprints(df, "text").collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    con = duckdb.connect()
    for i, t in enumerate(texts):
        exp = py_winnow(t)
        assert got.get(i, set()) == exp, f"spark mismatch on {t!r}"
        duck = con.execute(f"SELECT {winnow_fps_duckdb('t')} FROM (SELECT ? AS t)",
                           [t]).fetchone()[0]
        assert set(duck) == exp, f"duckdb mismatch on {t!r}"


def test_ivf_topk_recall_and_refine(spark):
    """IVF probes recover a reasonable share of the exact top-k, refine
    keeps centroids deterministic, and nprobe=all centroids ==> exact."""
    import math
    import random

    from dggstools_spark.operators.similarity import (ivf_centroids,
                                                      ivf_refine, ivf_topk)

    random.seed(11)
    dim = 8
    rows = [(i, [random.gauss(0, 1) for _ in range(dim)]) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    qs = emb.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))

    # exact reference via the brute-force path: nprobe >= n_centroids
    n_cents = ivf_centroids(emb).count()
    exact = {(r.q_id, r.vec_id) for r in
             ivf_topk(emb, qs, 3, nprobe=n_cents).collect()}
    approx = {(r.q_id, r.vec_id) for r in ivf_topk(emb, qs, 3, nprobe=4).collect()}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.4  # random gaussians = adversarial case, like ann_topk

    cents = ivf_centroids(emb)
    r1 = {(r.cid, tuple(r.cvec)) for r in ivf_refine(emb, cents, 2).collect()}
    r2 = {(r.cid, tuple(r.cvec)) for r in ivf_refine(emb, cents, 2).collect()}
    assert r1 == r2 and len(r1) == n_cents  # deterministic, no lost clusters


def test_bounds_axis_order_normalization():
    """F6: east/north family maps (minx,miny,maxx,maxy)->(l,t,r,b); exotic
    orders raise, like the reference."""
    import pytest

    from dggstools_spark.operators.metrics import \
        bounds_to_left_top_right_bottom as b2ltrb

    assert b2ltrb((1, 2, 3, 4)) == (1, 4, 3, 2)
    assert b2ltrb((1, 2, 3, 4), [("Easting", "east"), ("Northing", "north")]) \
        == (1, 4, 3, 2)
    with pytest.raises(NotImplementedError):
        b2ltrb((1, 2, 3, 4), [("Northing", "north"), ("Easting", "east")])
