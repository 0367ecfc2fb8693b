"""operators/sampling.py — the content-keyed determinism contract.

The operators' reason to exist is that `df.sample()` changes membership
under repartitioning/retries; these tests pin the opposite behavior:
IDENTICAL member sets regardless of partitioning, plus quota exactness,
salt decorrelation, and the documented NULL/duplicate edge semantics.
DuckDB value parity is covered by the driver-contract oracles
(queries6.py) via scripts/check_entry.py.
"""

import pytest
from pyspark.sql import functions as F

from dggstools_spark.operators.sampling import (hash_sample,
                                                stratified_sample,
                                                weighted_mixture)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "source").localCheckpoint())


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_hash_sample_partition_invariant(docs):
    base = _ids(hash_sample(docs, "doc_id", 0.3))
    assert 0 < len(base) < docs.count()
    for parts in (1, 7):
        again = _ids(hash_sample(docs.repartition(parts), "doc_id", 0.3))
        assert again == base  # the property df.sample() does NOT have


def test_hash_sample_rate_and_monotone_salts(docs):
    n = docs.count()
    got = len(_ids(hash_sample(docs, "doc_id", 0.5)))
    assert abs(got / n - 0.5) < 0.2  # Bernoulli tolerance on 50 docs
    # different salt -> different (roughly independent) sample
    a = _ids(hash_sample(docs, "doc_id", 0.5, salt="s0"))
    b = _ids(hash_sample(docs, "doc_id", 0.5, salt="s1"))
    assert a != b
    # rate=0/1 degenerate
    assert _ids(hash_sample(docs, "doc_id", 0.0)) == set()
    assert _ids(hash_sample(docs, "doc_id", 1.0)) == _ids(docs)


def test_hash_sample_null_keys_never_selected(spark):
    df = spark.createDataFrame([(None,), (1,), (2,)], "doc_id bigint")
    assert None not in _ids(hash_sample(df, "doc_id", 1.0))


def test_stratified_quota_exact_and_partition_invariant(docs):
    out = stratified_sample(docs, "source", "doc_id", 7)
    counts = {r.source: r.n for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    per_stratum = {r.source: r.n for r in
                   docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {s: min(7, c) for s, c in per_stratum.items()}
    base = _ids(out)
    assert _ids(stratified_sample(docs.repartition(5), "source", "doc_id", 7)) == base


def test_stratified_quota_exceeding_stratum_keeps_all(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(3)] + [("b", i + 10) for i in range(20)],
        "source string, doc_id bigint")
    out = stratified_sample(df, "source", "doc_id", 5)
    counts = {r.source: r.n for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 3, "b": 5}


def test_weighted_mixture_rates_and_determinism(docs):
    weights = {"src0": 1.0, "src1": 0.25}
    out = weighted_mixture(docs, "source", "doc_id", weights, total_rate=1.0)
    counts = {r.source: r.n for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # src0 kept at rate 1.0 -> all 25; src1 thinned to ~25*0.25
    assert counts["src0"] == 25
    assert 0 < counts.get("src1", 0) < 25
    # absent sources dropped entirely
    assert set(counts) == {"src0", "src1"}
    assert _ids(weighted_mixture(docs.repartition(3), "source", "doc_id",
                                 weights, total_rate=1.0)) == _ids(out)


def test_weighted_mixture_validation(docs):
    with pytest.raises(ValueError):
        weighted_mixture(docs, "source", "doc_id", {})
    with pytest.raises(ValueError):
        weighted_mixture(docs, "source", "doc_id", {"src0": 0.0})
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 1.5)
