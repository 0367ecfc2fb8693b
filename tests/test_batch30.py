"""Batch 30 (round 6): IVF+PQ composed ANN.

Key invariant: with nprobe >= the number of inverted lists, IVFPQ probes
every list, so its candidate set is the whole corpus and the result must
equal pq_topk's full ADC scan EXACTLY (same codes, same LUTs, same
quantized distances, same tie order).  Pruning (small nprobe) must then
be a subset-of-candidates effect only: every returned neighbor belongs
to a probed list of its query.
"""

from pyspark.sql import functions as F

from dggstools_spark.operators.pq import ivfpq_topk, pq_topk
from dggstools_spark.operators.similarity import ivf_assign, ivf_centroids


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _queries(emb):
    return emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))


def test_ivfpq_all_lists_equals_full_pq_scan(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    qs = _queries(emb)
    n_lists = emb.filter(F.col("vec_id") % 23 == 3).count()
    full = {(r.q_id, r.rank): (r.vec_id, r.adc_q)
            for r in pq_topk(emb, qs, 5).collect()}
    ivf = {(r.q_id, r.rank): (r.vec_id, r.adc_q)
           for r in ivfpq_topk(emb, qs, 5, nprobe=n_lists + 1).collect()}
    assert full == ivf and len(full) > 0


def test_ivfpq_adc_assign_equals_exact_when_all_probed(spark, sf_dir):
    # assignment mode cannot change results when every list is probed
    emb = _emb(spark, sf_dir)
    qs = _queries(emb)
    n_lists = emb.filter(F.col("vec_id") % 23 == 3).count()
    a = {(r.q_id, r.rank): (r.vec_id, r.adc_q)
         for r in ivfpq_topk(emb, qs, 4, nprobe=n_lists + 1,
                             assign_mode="adc").collect()}
    b = {(r.q_id, r.rank): (r.vec_id, r.adc_q)
         for r in ivfpq_topk(emb, qs, 4, nprobe=n_lists + 1,
                             assign_mode="exact").collect()}
    assert a == b and len(a) > 0


def test_ivfpq_pruned_candidates_come_from_probed_lists(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    qs = _queries(emb)
    out = ivfpq_topk(emb, qs, 3, nprobe=2, assign_mode="exact").collect()
    assert len(out) > 0
    # reconstruct assignment + probes independently
    cents = ivf_centroids(emb)
    assigned = {r.vec_id: r.cid
                for r in ivf_assign(emb, cents).select(
                    "vec_id", "cid").collect()}
    # per query: returned ids must live in <= 2 distinct lists
    per_q = {}
    for r in out:
        per_q.setdefault(r.q_id, set()).add(assigned[r.vec_id])
    assert all(len(lists) <= 2 for lists in per_q.values())
    # ranks are 1..k dense with ascending adc_q per query
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append((r.rank, r.adc_q))
    for rows in by_q.values():
        rows.sort()
        assert [rk for rk, _ in rows] == list(range(1, len(rows) + 1))
        assert all(rows[i][1] <= rows[i + 1][1]
                   for i in range(len(rows) - 1))
