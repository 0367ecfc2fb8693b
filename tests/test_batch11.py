"""Bigram-LM scoring + DSIR selection + PQ ANN (round 5, batch 11)."""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from dggstools_spark.operators.dsir import DSIR_PPM, dsir_scores
from dggstools_spark.operators.lm import LM_PPM, doc_bigrams, lm_score
from dggstools_spark.operators.pq import (PQ_QUANT, pq_codebook, pq_encode,
                                          pq_topk)


def _docs(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


# ------------------------------------------------------------------ lm_score

def test_doc_bigrams_adjacent_pairs(spark):
    df = _docs(spark, [(1, "a b c"), (2, "x"), (3, None)])
    rows = doc_bigrams(df, "text").select("doc_id", "bg").collect()
    assert sorted((r.doc_id, r.bg) for r in rows) == [(1, "a b"), (1, "b c")]


def test_lm_score_hand_computed(spark):
    # corpus: doc1 = "a b a b" -> bigrams [a b, b a, a b]; doc2 = "a b"
    # c12: "a b"=3, "b a"=1; c1: a=3, b=1; V = 2 distinct tokens
    df = _docs(spark, [(1, "a b a b"), (2, "a b")])
    rows = {r.doc_id: r for r in lm_score(df, "text", "doc_id").collect()}
    ppm_ab = (3 + 1) * LM_PPM // (3 + 2)   # 800000
    ppm_ba = (1 + 1) * LM_PPM // (1 + 2)   # 666666
    assert rows[1].n_bigrams == 3
    assert rows[1].sum_ppm == 2 * ppm_ab + ppm_ba
    assert rows[1].avg_ppm == (2 * ppm_ab + ppm_ba) // 3
    assert rows[2].n_bigrams == 1 and rows[2].avg_ppm == ppm_ab


def test_lm_score_separate_train_corpus(spark):
    # model trained on train_df only: V=2, c12("a b")=1, c1(a)=1
    df = _docs(spark, [(7, "a b")])
    train = _docs(spark, [(1, "a b")])
    r = lm_score(df, "text", "doc_id", train_df=train).collect()[0]
    assert r.sum_ppm == (1 + 1) * LM_PPM // (1 + 2)


def test_lm_score_favours_common_continuations(spark):
    # "the cat" appears often; "the zzz" once — common bigram scores higher
    rows = [(i, "the cat sat") for i in range(9)] + [(99, "the zzz sat")]
    out = {r.doc_id: r.avg_ppm
           for r in lm_score(_docs(spark, rows), "text", "doc_id").collect()}
    assert out[0] > out[99]


# --------------------------------------------------------------- dsir_select

def _bucket(tok: str, b: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % b


def test_dsir_scores_hand_computed(spark):
    b = 64
    df = _docs(spark, [(1, "aa aa", "en"), (2, "bb bb", "de")],
               "doc_id long, text string, lang string")
    out = {r.doc_id: r for r in
           dsir_scores(df, "text", "doc_id",
                       target=F.col("lang") == "en", n_buckets=b).collect()}
    ba, bb = _bucket("aa", b), _bucket("bb", b)
    assert ba != bb  # the test corpus must not collide
    # bucket stats: ba (r=2, t=2), bb (r=2, t=0); R=4, T=2
    w = {ba: (2 + 1) * DSIR_PPM // (2 + b) - (2 + 1) * DSIR_PPM // (4 + b),
         bb: (0 + 1) * DSIR_PPM // (2 + b) - (2 + 1) * DSIR_PPM // (4 + b)}
    assert out[1].score == 2 * w[ba] and out[1].is_target == 1
    assert out[2].score == 2 * w[bb] and out[2].is_target == 0
    assert out[1].score > out[2].score  # target-like docs rank first


def test_dsir_topk_rank(spark):
    df = _docs(spark, [(i, "tok%d x" % (i % 3), "en" if i % 3 == 0 else "fr")
                       for i in range(9)],
               "doc_id long, text string, lang string")
    rows = dsir_scores(df, "text", "doc_id",
                       target=F.col("lang") == "en", n_buckets=256,
                       k=3).collect()
    assert [r.rank for r in rows] == [1, 2, 3]
    # the target slice (i % 3 == 0 docs) should fill the top ranks
    assert all(r.is_target == 1 for r in rows)


# ------------------------------------------------------------------- pq_topk

def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")


def _np_pq(vecs, m, dsub, k, seed_mod):
    """Numpy replica of the deterministic PQ construction."""
    v = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    seed_ids = [i for i in range(len(vecs)) if i % seed_mod == 0][:k]
    cents = v[seed_ids]  # (k, dim)
    codes = np.empty((len(vecs), m), dtype=int)
    luts = {}
    dq = np.empty((len(vecs), m, len(seed_ids)), dtype=np.int64)
    for j in range(m):
        s = slice(j * dsub, (j + 1) * dsub)
        d2 = ((v[:, None, s] - cents[None, :, s]) ** 2).sum(axis=2)
        dq[:, j, :] = np.round(d2 * PQ_QUANT).astype(np.int64)
        codes[:, j] = np.argmin(dq[:, j, :], axis=1)  # ties: lowest cid
    return codes, dq


def test_pq_encode_matches_numpy(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(10, 4).round(3)
    df = _emb_df(spark, vecs)
    m, dsub, k, mod = 2, 2, 3, 2
    cb = pq_codebook(df, m=m, dsub=dsub, k=k, seed_mod=mod, seed_res=0)
    got = {r.vec_id: list(r.codes)
           for r in pq_encode(df, cb, m=m, dsub=dsub).collect()}
    exp, _ = _np_pq(vecs, m, dsub, k, mod)
    assert got == {i: list(exp[i]) for i in range(10)}


def test_pq_topk_matches_numpy_adc(spark):
    rng = np.random.RandomState(11)
    vecs = rng.randn(12, 4).round(3)
    df = _emb_df(spark, vecs)
    m, dsub, k, mod, topk = 2, 2, 3, 2, 4
    qs = df.filter(F.col("vec_id") % 6 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    rows = pq_topk(df, qs, topk, m=m, dsub=dsub, k=k,
                   seed_mod=mod, seed_res=0).collect()
    codes, dq = _np_pq(vecs, m, dsub, k, mod)
    for q in (0, 6):
        adc = {i: sum(int(dq[q, j, codes[i, j]]) for j in range(m))
               for i in range(12) if i != q}
        exp = sorted(adc.items(), key=lambda t: (t[1], t[0]))[:topk]
        got = sorted([(r.vec_id, r.adc_q) for r in rows if r.q_id == q],
                     key=lambda t: t[1])
        assert [(i, a) for i, a in exp] == got


def test_pq_rank_deterministic_tie_break(spark):
    # identical vectors -> identical ADC distances; rank must break by id
    df = _emb_df(spark, [[1.0, 0.0]] * 4)
    qs = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    rows = pq_topk(df, qs, 3, m=1, dsub=2, k=2, seed_mod=1,
                   seed_res=0).orderBy("rank").collect()
    assert [r.vec_id for r in rows] == [1, 2, 3]


def test_lm_score_model_sink_parity(spark, tmp_path):
    """model_path (VERDICT r5 #5): parquet-backed model sink gives
    bit-identical scores to the checkpoint path, and the scoring plan
    reads the model from a parquet FileScan."""
    rows = [(i, "a b a c a b " + ("x y " * (i % 3))) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = {(r.doc_id): (r.n_bigrams, r.sum_ppm, r.avg_ppm)
            for r in lm_score(df, "text", "doc_id").collect()}
    mp = str(tmp_path / "model")
    sunk = lm_score(df, "text", "doc_id", model_path=mp)
    got = {(r.doc_id): (r.n_bigrams, r.sum_ppm, r.avg_ppm)
           for r in sunk.collect()}
    assert got == base
    plan = sunk._jdf.queryExecution().executedPlan().toString()
    assert "model" in plan and "Parquet" in plan, plan[:2000]
