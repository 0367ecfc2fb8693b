"""Focused tests for the r7 kring/neighbor internals rewrite.

r7 replaced the broadcast-join seam branch of cell_neighbors /
_xface_contrib with compiled CASE slot expressions (_nbr_slot_exprs)
and rewrote kring_cells as a lazy numeric-coordinate walk.  These tests
pin the rewritten internals against two independent references:

- the DuckDB twin (cell_neighbors_sql / kring_cells_sql keep the
  original join-form SQL — the frozen oracle dialect), and
- first-principles properties (symmetry, degree counts, ring-1 ==
  radius-1 relation).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dggstools_spark.operators.spatial_stats import (
    cell_neighbors, cell_neighbors_sql, kring_cells, kring_cells_sql)


def _full_lattice(spark, res):
    from dggstools_spark.operators.pointpat import _face_lattice

    return _face_lattice(spark, ["N", "O", "P", "Q", "R", "S"], res)


@pytest.mark.parametrize("res", [1, 2])
def test_cell_neighbors_slots_match_duckdb_join_form(spark, res):
    """The slot-expression enumeration equals the DuckDB join-form twin
    (pairs AND multiplicities) on the complete 6-face lattice."""
    ref = _full_lattice(spark, res)
    got = sorted(
        (r.cellid, r.nbr, r.across)
        for r in cell_neighbors(ref, res, cross_face=True).collect())
    ids = [r.cellid for r in ref.collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE src (cellid VARCHAR)")
    con.executemany("INSERT INTO src VALUES (?)", [(i,) for i in ids])
    want = sorted(map(tuple, con.execute(
        cell_neighbors_sql("(SELECT cellid FROM src)", res,
                           cross_face=True)).fetchall()))
    assert got == want


def test_cell_neighbors_symmetry_and_degree(spark):
    """Adjacency is symmetric; every cell has 8 neighbors except the 24
    cube corners (7) under cross-face closure at res 2."""
    res = 2
    ref = _full_lattice(spark, res)
    nb = cell_neighbors(ref, res, cross_face=True) \
        .select("cellid", "nbr").collect()
    pairs = {(r.cellid, r.nbr) for r in nb}
    assert len(pairs) == len(nb), "duplicate neighbor pairs"
    assert all((b, a) in pairs for a, b in pairs), "asymmetric adjacency"
    deg = {}
    for a, _ in pairs:
        deg[a] = deg.get(a, 0) + 1
    assert sorted(set(deg.values())) == [7, 8]
    assert sum(1 for d in deg.values() if d == 7) == 24  # cube corners


@pytest.mark.parametrize("k", [1, 2, 3])
def test_kring_walk_matches_duckdb_bfs(spark, k):
    """The lazy walk's min-ring equals the DuckDB unrolled-BFS twin on a
    seeded subset (rings are exact min-hop graph distances)."""
    res = 2
    seeds = _full_lattice(spark, res).filter(
        F.expr("substring(cellid, 2, 2) IN ('00', '44', '88', '08')"))
    got = sorted((r.cellid, r.nbr, r.ring)
                 for r in kring_cells(seeds, res, k).collect())
    ids = [r.cellid for r in seeds.collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE seeds (cellid VARCHAR)")
    con.executemany("INSERT INTO seeds VALUES (?)", [(i,) for i in ids])
    want = sorted(map(tuple, con.execute(
        kring_cells_sql("(SELECT cellid FROM seeds)", res, k)).fetchall()))
    assert got == want


def test_kring_dedup_threshold_equivalence(spark):
    """k >= 4 flips the per-level distinct on — results must be
    identical to the k = 3 rings plus the new ring (the dedup is a pure
    execution-shape choice)."""
    res = 2
    seeds = _full_lattice(spark, res).filter(
        F.expr("cellid IN ('Q44', 'N00')"))
    k3 = {(r.cellid, r.nbr): r.ring
          for r in kring_cells(seeds, res, 3).collect()}
    k4 = {(r.cellid, r.nbr): r.ring
          for r in kring_cells(seeds, res, 4).collect()}
    for key, ring in k3.items():
        assert k4[key] == ring, f"ring moved for {key}"
    assert all(r == 4 for key, r in k4.items() if key not in k3)
