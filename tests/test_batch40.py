"""Batch 40 (round 6): greedy k-center coreset selection.

Checked against an independent Python Gonzalez implementation with the
same quantized-cosine distance (test vectors chosen so no cosine lands
on a rounding half-boundary — the constraint-17 discipline), plus the
k-center monotonicity invariant.
"""

import math

from dggstools_spark.operators.coreset import kcenter_select

VECS = {
    1: [1.0, 0.0, 0.0, 0.0],
    2: [0.9, 0.1, 0.0, 0.3],
    3: [0.0, 1.0, 0.0, 0.0],
    4: [0.0, 0.95, 0.31, 0.0],
    5: [0.0, 0.0, 0.0, 1.0],
    6: [0.57, 0.57, 0.57, 0.1],
}


def _ref(vecs, rounds):
    def dq(a, b):
        dot = sum(x * y for x, y in zip(vecs[a], vecs[b]))
        na = math.sqrt(sum(x * x for x in vecs[a]))
        nb = math.sqrt(sum(x * x for x in vecs[b]))
        return 10**9 - round(1e9 * dot / (na * nb))

    ids = sorted(vecs)
    chosen = [(1, ids[0], -1)]
    picked = {ids[0]}
    mind = {i: dq(i, ids[0]) for i in ids}
    for rnd in range(2, rounds + 1):
        best = min((i for i in ids if i not in picked),
                   key=lambda i: (-mind[i], i))
        chosen.append((rnd, best, mind[best]))
        picked.add(best)
        for i in ids:
            mind[i] = min(mind[i], dq(i, best))
    return chosen


def _run(spark, vecs, rounds):
    df = spark.createDataFrame(
        [(i, v) for i, v in sorted(vecs.items())],
        "vec_id long, embedding array<double>")
    return [(r.round, r.vec_id, r.sel_d_q9)
            for r in kcenter_select(df, "vec_id", "embedding",
                                    rounds, 4)
            .orderBy("round").collect()]


def test_kcenter_matches_reference(spark):
    assert _run(spark, VECS, 5) == _ref(VECS, 5)


def test_kcenter_seed_is_min_id_and_picks_distinct(spark):
    out = _run(spark, VECS, 6)
    assert out[0] == (1, 1, -1)
    ids = [v for _, v, _ in out]
    assert len(set(ids)) == 6


def test_kcenter_selection_distances_nonincreasing(spark):
    out = _run(spark, VECS, 6)
    ds = [d for _, _, d in out[1:]]
    assert ds == sorted(ds, reverse=True)


def test_kcenter_duplicates_deferred(spark):
    # an exact duplicate of the seed has distance 0 and must come last
    vecs = dict(VECS)
    vecs[7] = list(VECS[1])
    out = _run(spark, vecs, 7)
    assert out == _ref(vecs, 7)
    assert out[-1][1] == 7 and out[-1][2] == 0
