"""Batch 37 (round 6): deterministic synchronous label propagation.

Checked against an INDEPENDENT pure-Python sync-LPA implementation
(same symmetrization, same weight-argmax/lexicographic-tie rule) on a
two-cliques-with-weak-bridge graph, plus structural invariants.
"""

from pyspark.sql import functions as F

from dggstools_spark.operators.graph import lpa_communities


def _ref_lpa(edges, iters):
    sym = {}
    for u, v, w in edges:
        if u == v:
            continue
        sym[(u, v)] = sym.get((u, v), 0) + w
        sym[(v, u)] = sym.get((v, u), 0) + w
    nodes = sorted({n for e in sym for n in e})
    nbrs = {}
    for (u, v), w in sym.items():
        nbrs.setdefault(u, {})[v] = w
    labels = {n: n for n in nodes}
    for _ in range(iters):
        new = {}
        for n in nodes:
            ws = {}
            for v, w in nbrs.get(n, {}).items():
                lv = labels[v]
                ws[lv] = ws.get(lv, 0) + w
            if ws:
                mx = max(ws.values())
                new[n] = min(l for l, w in ws.items() if w == mx)
            else:
                new[n] = labels[n]
        labels = new
    return labels


EDGES = [("a", "b", 10), ("b", "c", 10), ("a", "c", 10),
         ("x", "y", 10), ("y", "z", 10), ("x", "z", 10),
         ("c", "x", 1)]


def _run(spark, edges, iters):
    df = spark.createDataFrame(edges, "u string, v string, w long")
    return {r.node: r.label
            for r in lpa_communities(df, "u", "v", "w", iters).collect()}


def test_lpa_matches_reference_each_round(spark):
    for iters in (1, 2, 3, 4):
        assert _run(spark, EDGES, iters) == _ref_lpa(EDGES, iters)


def test_lpa_cliques_stay_separate_across_weak_bridge(spark):
    got = _run(spark, EDGES, 4)
    left = {got[n] for n in "abc"}
    right = {got[n] for n in "xyz"}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_lpa_directed_weights_symmetrized_and_selfloops_dropped(spark):
    edges = [("p", "q", 3), ("q", "p", 5), ("p", "p", 99),
             ("q", "r", 1)]
    assert _run(spark, edges, 2) == _ref_lpa(edges, 2)


def test_lpa_single_edge_two_cycles_as_documented(spark):
    # the documented sync-LPA oscillation: a lone edge swaps labels each
    # round, so after an EVEN budget both nodes are back at their own id
    edges = EDGES + [("m", "n", 2)]
    got = _run(spark, edges, 4)
    assert (got["m"], got["n"]) == ("m", "n")
    assert got == _ref_lpa(edges, 4)


def test_lpa_isolated_triangle_converges_to_min_label(spark):
    edges = EDGES + [("m", "n", 2), ("n", "o", 2), ("m", "o", 2)]
    got = _run(spark, edges, 4)
    assert got["m"] == got["n"] == got["o"]
    assert got == _ref_lpa(edges, 4)
