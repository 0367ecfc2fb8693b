"""operators/text_rank.py — BM25 semantics vs an independent pure-Python
implementation (the DuckDB value parity is covered by the driver-contract
oracle, queries6.q_bm25_topk; here the MATH itself is checked against a
from-scratch reference on a fixture small enough to verify by hand)."""

import math

import pytest
from pyspark.sql import functions as F

from dggstools_spark.operators.text_rank import B, K1, Q_SHIFT, bm25_topk

DOCS = [
    (0, "spark runs fast and spark scales"),
    (1, "ducks swim fast"),
    (2, "spark and ducks and spark and ducks"),
    (3, "nothing relevant here at all whatsoever truly"),
    (4, "fast fast fast spark"),
]


def _py_bm25(terms):
    toks = {i: t.lower().split(" ") for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for t in terms:
        df = sum(1 for v in toks.values() if t in v)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for i, v in toks.items():
            tf = v.count(t)
            if tf == 0:
                continue
            s = idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * len(v) / avgdl))
            scores[i] = scores.get(i, 0) + round(s * (1 << Q_SHIFT))
    return scores


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_bm25_matches_reference_math(docs_df):
    terms = ["spark", "ducks"]
    got = {r.doc_id: r.score_q20
           for r in bm25_topk(docs_df, "text", "doc_id", terms, 10).collect()}
    assert got == _py_bm25(terms)


def test_bm25_ranking_order_and_k(docs_df):
    out = bm25_topk(docs_df, "text", "doc_id", ["spark"], 2).collect()
    assert [r.rank for r in out] == [1, 2]
    # doc 2 has tf=2 in 8 tokens; doc 0 tf=2 in 6 tokens (shorter doc ->
    # higher score); doc 4 tf=1
    assert out[0].doc_id == 0 and out[1].doc_id == 2
    # non-matching docs absent entirely even with large k
    all_rows = bm25_topk(docs_df, "text", "doc_id", ["spark"], 100).collect()
    assert {r.doc_id for r in all_rows} == {0, 2, 4}


def test_bm25_partition_invariant(docs_df):
    a = {(r.doc_id, r.score_q20) for r in
         bm25_topk(docs_df, "text", "doc_id", ["spark", "fast"], 10).collect()}
    b = {(r.doc_id, r.score_q20) for r in
         bm25_topk(docs_df.repartition(4), "text", "doc_id",
                   ["spark", "fast"], 10).collect()}
    assert a == b


def test_bm25_empty_terms_raises(docs_df):
    with pytest.raises(ValueError):
        bm25_topk(docs_df, "text", "doc_id", [], 5)
