"""OOV rate + hybrid retrieval + embedding clusters (round 5, batch 12)."""

import math

from pyspark.sql import functions as F

from dggstools_spark.operators.hybrid import hybrid_rerank
from dggstools_spark.operators.vocab import oov_rate


def _docs(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


# ------------------------------------------------------------------ oov_rate

def test_oov_rate_hand_computed(spark):
    # vocab(v=2) = {a, b} (a:4, b:3 beat c:1, d:1); doc2 has 1 OOV of 3
    df = _docs(spark, [(1, "a a a b b c"), (2, "a b d")])
    out = {r.doc_id: r for r in oov_rate(df, "text", "doc_id", v=2).collect()}
    assert out[1].n_toks == 6 and out[1].n_oov == 1
    assert out[1].oov_ppm == 1 * 1000000 // 6
    assert out[2].n_toks == 3 and out[2].n_oov == 1
    assert out[2].oov_ppm == 1000000 // 3


def test_oov_rate_full_vocab_zero(spark):
    df = _docs(spark, [(1, "x y"), (2, "y x")])
    rows = oov_rate(df, "text", "doc_id", v=10).collect()
    assert all(r.n_oov == 0 and r.oov_ppm == 0 for r in rows)


def test_oov_rate_tie_break_matches_induction(spark):
    # a and b tie at 2; v=1 keeps 'a' (lexicographic tie-break, same rule
    # as vocab_topk) so 'b' is OOV
    df = _docs(spark, [(1, "a b a b")])
    r = oov_rate(df, "text", "doc_id", v=1).collect()[0]
    assert r.n_oov == 2


# ------------------------------------------------------------- hybrid_rerank

def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")


def test_hybrid_rerank_orders_by_cosine_within_recall(spark):
    # three docs all hit the term; doc 2's vector aligns best with q
    docs = _docs(spark, [(0, "hash x"), (1, "hash y"), (2, "hash z"),
                         (3, "nothing here")])
    emb = _emb(spark, [[1.0, 0.0], [0.0, 1.0], [0.8, 0.6], [1.0, 0.0]])
    qv = spark.createDataFrame([([0.6, 0.8],)], "q_vec array<float>")
    rows = hybrid_rerank(docs, emb, ["hash"], qv, n_recall=3, k=3,
                         dim=2).orderBy("rank").collect()
    # doc 3 never enters the rerank (no term hit -> outside recall)
    assert [r.doc_id for r in rows] != []
    assert all(r.doc_id != 3 for r in rows)
    cos = {r.doc_id: r.cos for r in rows}
    # cosines (float32 inputs): doc2 ≈ 0.96, doc1 = 0.8, doc0 = 0.6
    assert math.isclose(cos[2], 0.96, abs_tol=1e-6)
    assert [r.doc_id for r in rows] == [2, 1, 0]


def test_hybrid_rerank_recall_bound_respected(spark):
    # n_recall=1 keeps only the best BM25 doc regardless of cosine
    docs = _docs(spark, [(0, "hash hash hash"), (1, "hash")])
    emb = _emb(spark, [[1.0, 0.0], [0.0, 1.0]])
    qv = spark.createDataFrame([([0.0, 1.0],)], "q_vec array<float>")
    rows = hybrid_rerank(docs, emb, ["hash"], qv, n_recall=1, k=5,
                         dim=2).collect()
    assert [r.doc_id for r in rows] == [0]  # doc1's perfect cosine never seen


# ------------------------------------------------------------ embed_clusters

def test_embed_clusters_transitive_min_label(spark):
    from dggstools_spark.operators.dedup import (dedup_clusters,
                                                 embedding_cosine_pairs)

    # 0~1~2 form a near-dup chain; 3 is orthogonal
    emb = _emb(spark, [[1.0, 0.0], [0.999, 0.01], [0.998, 0.02],
                       [0.0, 1.0]])
    pairs = embedding_cosine_pairs(emb, "embedding", "vec_id",
                                   threshold=0.99, n_planes=2,
                                   max_bucket=None, dim=2)
    out = {r.vec_id: r.cluster_id
           for r in dedup_clusters(pairs, node_col="vec_id").collect()}
    assert out.get(0) == 0 and out.get(1) == 0 and out.get(2) == 0
    assert 3 not in out  # no pairs -> not in the cluster table
