"""Batch 29 (round 6): cross-face k-ring + categorical spatial stats.

The k-ring is verified against an INDEPENDENT BFS composed in Python from
cell_neighbors (itself seam-verified in test_topology), so the ring
semantics can't drift from the radius-1 relation they're defined by.
"""

from pyspark.sql import functions as F

from dggstools_spark.operators.diversity import class_diversity, join_counts
from dggstools_spark.operators.spatial_stats import cell_neighbors, kring_cells


def _ring_sets(spark, seed: str, res: int):
    """Independent BFS: (ring1, ring2) cellid sets via cell_neighbors."""
    one = spark.createDataFrame([(seed,)], "cellid string")
    r1 = {r.nbr for r in cell_neighbors(one, res).collect()}
    f1 = spark.createDataFrame([(c,) for c in sorted(r1)], "cellid string")
    hop = {r.nbr for r in cell_neighbors(f1, res).collect()}
    r2 = hop - r1 - {seed}
    return r1, r2


def test_kring_interior_is_chebyshev_disk(spark):
    # face-center seed at res 2: rings are pure Chebyshev shells
    seed = "N44"  # (row, col) = (4, 4), 2+ cells from every face edge
    df = spark.createDataFrame([(seed,)], "cellid string")
    out = kring_cells(df, 2, 2).collect()
    by_ring = {}
    for r in out:
        assert r.cellid == seed
        by_ring.setdefault(r.ring, set()).add(r.nbr)
    assert len(by_ring[1]) == 8 and len(by_ring[2]) == 16
    r1, r2 = _ring_sets(spark, seed, 2)
    assert by_ring[1] == r1 and by_ring[2] == r2


def test_kring_cube_corner_crosses_seams(spark):
    # cube-corner seed: 7 radius-1 neighbors (no across-corner diagonal),
    # rings must match the independent BFS including cross-face cells
    seed = "N00"
    df = spark.createDataFrame([(seed,)], "cellid string")
    out = kring_cells(df, 2, 2).collect()
    by_ring = {}
    for r in out:
        by_ring.setdefault(r.ring, set()).add(r.nbr)
    assert len(by_ring[1]) == 7
    r1, r2 = _ring_sets(spark, seed, 2)
    assert by_ring[1] == r1 and by_ring[2] == r2
    # at least one ring-2 cell sits on a third face (corner joins 3 faces)
    faces = {c[0] for c in by_ring[1] | by_ring[2]}
    assert len(faces) == 3


def test_kring_multi_seed_min_distance(spark):
    # two adjacent seeds: each is the other's ring-1; a cell adjacent to
    # both is ring 1 for both (min distance, not path multiplicity)
    df = spark.createDataFrame([("N44",), ("N45",)], "cellid string")
    rows = kring_cells(df, 2, 2).collect()
    d = {(r.cellid, r.nbr): r.ring for r in rows}
    assert d[("N44", "N45")] == 1 and d[("N45", "N44")] == 1
    # (row 3, col 4) = "N41" touches both seeds diagonally/orthogonally
    assert d[("N44", "N41")] == 1 and d[("N45", "N41")] == 1
    assert len(d) == len(rows)  # no (cellid, nbr) dup across rings


def test_class_diversity_exact_values(spark):
    rows = [("a", "x"), ("a", "x"), ("a", "y"), ("a", "y"),
            ("b", "z"), ("b", "z"), ("b", "z")]
    df = spark.createDataFrame(rows, "k string, cls string")
    out = {r.k: r for r in class_diversity(df, "k", "cls").collect()}
    # a: N=4, ss=8 -> (16-8)*1e6 div 16 = 500000; b: single class -> 0
    assert (out["a"].n_obs, out["a"].richness, out["a"].gs_ppm) \
        == (4, 2, 500_000)
    assert (out["b"].n_obs, out["b"].richness, out["b"].gs_ppm) \
        == (3, 1, 0)


def test_join_counts_2x2_block_exact(spark):
    # 2x2 interior block at res 2, all four cells mutually queen-adjacent
    # (W = 6): AA=1, AB=4, BB=1; free-sampling expectation with n=4,
    # n_a=n_b=2: E[AA]=W*2*1/12, E[AB]=W*2*2*2/12 -> ppm 1e6 / 4e6 / 1e6
    rows = [("N44", "A"), ("N45", "A"), ("N47", "B"), ("N48", "B")]
    df = spark.createDataFrame(rows, "cellid string, cls string")
    out = {(r.cls_a, r.cls_b): r
           for r in join_counts(df, 2, "cls").collect()}
    assert out[("A", "A")].n_joins == 1
    assert out[("A", "B")].n_joins == 4
    assert out[("B", "B")].n_joins == 1
    assert out[("A", "A")].expected_ppm == 1_000_000
    assert out[("A", "B")].expected_ppm == 4_000_000
    assert out[("B", "B")].expected_ppm == 1_000_000


def test_join_counts_unlabeled_neighbors_ignored(spark):
    # two adjacent labeled cells surrounded by unlabeled grid: one join
    rows = [("N44", "A"), ("N45", "B")]
    df = spark.createDataFrame(rows, "cellid string, cls string")
    out = join_counts(df, 2, "cls").collect()
    assert len(out) == 1
    r = out[0]
    # n=2: E[AB] = W * 2*1*1 / (2*1) = W = 1 -> 1e6 ppm
    assert (r.cls_a, r.cls_b, r.n_joins, r.expected_ppm) \
        == ("A", "B", 1, 1_000_000)
