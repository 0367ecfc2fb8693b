"""Passage dedup + cross-corpus dedup + distribution percentiles
(round 5, batch 9)."""

import math

from pyspark.sql import functions as F

from dggstools_spark.operators.passage import passage_dedup, passages
from dggstools_spark.operators.dedup import cross_corpus_dedup
from dggstools_spark.operators.stats import distribution_percentiles


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------------ passages

def test_passages_chunking(spark):
    df = _docs(spark, [(1, " ".join(f"w{i}" for i in range(10)))])
    got = {r.chunk_idx: r.passage
           for r in passages(df, "text", "doc_id", chunk_tokens=4).collect()}
    assert got == {0: "w0 w1 w2 w3", 1: "w4 w5 w6 w7", 2: "w8 w9"}


def test_passage_dedup_first_occurrence_keep(spark):
    # doc 1 and doc 2 share an identical 4-token chunk at aligned positions;
    # the (doc_id, chunk_idx)-smallest occurrence survives
    shared = "a b c d"
    df = _docs(spark, [(1, shared + " x y z w"),
                       (2, shared + " p q r s"),
                       (3, "u v t n " + shared)])
    out = {r.doc_id: r for r in
           passage_dedup(df, "text", "doc_id", chunk_tokens=4).collect()}
    assert out[1].n_dropped == 0 and out[1].n_kept == 2
    assert out[2].n_dropped == 1 and out[2].n_kept == 1
    assert out[3].n_dropped == 1  # its chunk_idx=1 copy loses to doc 1
    # rebuild hashes: doc 2 keeps only its tail chunk
    import hashlib
    assert out[2].rebuilt_md5 == hashlib.md5(b"p q r s").hexdigest()
    assert out[3].rebuilt_md5 == hashlib.md5(b"u v t n").hexdigest()
    assert out[2].kept_tokens == 4


def test_passage_dedup_all_dropped_doc_hashes_empty(spark):
    df = _docs(spark, [(1, "a b"), (2, "a b")])
    out = {r.doc_id: r for r in
           passage_dedup(df, "text", "doc_id", chunk_tokens=4).collect()}
    import hashlib
    assert out[2].n_kept == 0
    assert out[2].rebuilt_md5 == hashlib.md5(b"").hexdigest()


# --------------------------------------------------------------- cross dedup

def test_cross_corpus_flags(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy dog again and then"
    df = _docs(spark, [
        (10, base),                # existing
        (11, "completely different words entirely here now"),  # existing
        (20, base),                # incoming: exact dup of 10
        (21, near),                # incoming: near dup of 10
        (22, "nothing shares any shingle with snapshot docs"),  # incoming
    ])
    existing = df.filter(F.col("doc_id") < 20)
    incoming = df.filter(F.col("doc_id") >= 20)
    out = {r.doc_id: r for r in cross_corpus_dedup(
        existing, incoming, "text", "doc_id").collect()}
    assert set(out) == {20, 21, 22}
    assert out[20].exact_dup == 1 and out[20].kept == 0
    assert out[21].exact_dup == 0 and out[21].near_dup == 1 and out[21].kept == 0
    assert out[22].exact_dup == 0 and out[22].near_dup == 0 and out[22].kept == 1


def test_cross_dedup_is_one_directional(spark):
    # two identical INCOMING docs with no existing counterpart stay kept:
    # incoming is never deduped against itself here
    df = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta eta theta")])
    inc = _docs(spark, [(30, "iota kappa lambda mu nu xi omicron pi"),
                        (31, "iota kappa lambda mu nu xi omicron pi")])
    out = cross_corpus_dedup(df, inc, "text", "doc_id").collect()
    assert all(r.kept == 1 for r in out)


# --------------------------------------------------------- percentile profile

def test_distribution_percentiles_vs_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vals = rng.randint(1, 400, size=500).tolist()
    df = spark.createDataFrame(
        [("g", int(v)) for v in vals], "grp string, v long")
    row = distribution_percentiles(df, "grp", "v").collect()[0]
    s = sorted(vals)
    for q, col in ((0.5, "p50_v"), (0.9, "p90_v"), (0.99, "p99_v")):
        expect = s[math.ceil(q * len(s)) - 1]  # type-1 lower quantile
        assert getattr(row, col) == expect, (q, getattr(row, col), expect)
    assert row.n_rows == 500
    assert row.sum_v == sum(vals)
    assert row.min_v == min(vals) and row.max_v == max(vals)


def test_distribution_percentiles_integer_ceil_rule(spark):
    # n=10, q=0.9 -> position ceil(9.0)=9 exactly; float 10*0.9 is
    # 9.000000000000002 and a float ceil would pick position 10
    df = spark.createDataFrame(
        [("g", v) for v in range(1, 11)], "grp string, v long")
    row = distribution_percentiles(df, "grp", "v").collect()[0]
    assert row.p90_v == 9
    assert row.p50_v == 5
