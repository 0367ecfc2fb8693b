"""SemDeDup semantic dedup (round 6, batch 23)."""

from pyspark.sql import functions as F

from dggstools_spark.operators.semdedup import semantic_dedup


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_drop_rule_and_min_id_survives(spark):
    # centroids: mod=3, residue=0 -> ids 0, 3 are centroids.
    # cluster around id 0 (x-axis): 0, 1, 4 near-identical -> 1 and 4 drop
    # (0 is the min id); 7 orthogonal-ish but still nearest x-axis.
    # cluster around id 3 (y-axis): 3 and 5 near-identical -> 5 drops.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),
        (4, [0.998, -0.02, 0.0, 0.0]),
        (7, [0.8, -0.6, 0.0, 0.0]),     # nearest x-axis, sim(0)=0.8 < 0.95
        (3, [0.0, 1.0, 0.0, 0.0]),
        (5, [0.0, 0.999, 0.01, 0.0]),
    ]
    out = {r.cid: (r.n_docs, r.n_dropped, r.kept_id_sum)
           for r in semantic_dedup(_emb(spark, rows), 0.95,
                                   mod=3, residue=0, dim=4).collect()}
    assert out == {0: (4, 2, 7), 3: (2, 1, 3)}


def test_threshold_one_keeps_everything(spark):
    rows = [(i, [float(i + 1), 1.0, 0.0, 0.0]) for i in range(8)]
    out = semantic_dedup(_emb(spark, rows), 1.0000001,
                         mod=4, residue=1, dim=4).collect()
    assert sum(r.n_dropped for r in out) == 0
    assert sum(r.n_docs for r in out) == 8
    assert sum(r.kept_id_sum for r in out) == sum(range(8))
