"""Length histogram + corpus diff + fertility (round 5, batch 15)."""

from dggstools_spark.operators.profile import (corpus_diff, fertility,
                                               len_histogram)

PPM = 1_000_000


def _docs(spark, rows, schema="doc_id long, text string, lang string"):
    return spark.createDataFrame(rows, schema)


# ------------------------------------------------------------ len_histogram

def test_len_histogram_buckets_and_waste(spark):
    # doc lengths 3 and 100 -> buckets bitlen(3)=2, bitlen(100)=7
    df = _docs(spark, [(1, "a b c", "en"), (2, " ".join(["t"] * 100), "en")])
    rows = {r.bucket: r for r in len_histogram(df, "text").collect()}
    assert set(rows) == {2, 7}
    assert rows[2].n_docs == 1 and rows[2].total_toks == 3
    # waste at max_len=64 for n=3: pad=64, waste=61
    assert rows[2].waste64_ppm == 61 * PPM // 64
    # n=100 at max_len=64: 2 sequences = 128 slots, waste 28
    assert rows[7].waste64_ppm == 28 * PPM // 128
    # n=100 at 128: 1 seq, waste 28/128
    assert rows[7].waste128_ppm == 28 * PPM // 128
    # n=100 at 512: waste 412/512
    assert rows[7].waste512_ppm == 412 * PPM // 512


# -------------------------------------------------------------- corpus_diff

def test_corpus_diff_statuses(spark):
    a = _docs(spark, [(1, "one two", "en"), (2, "x y z", "en"),
                      (3, "same here", "en")])
    b = _docs(spark, [(2, "x y z CHANGED", "en"), (3, "same here", "en"),
                      (9, "brand new", "en")])
    out = {r.status: r for r in corpus_diff(a, b, "text", "doc_id").collect()}
    assert out["removed"].n_docs == 1 and out["removed"].n_toks == 2
    assert out["changed"].n_docs == 1 and out["changed"].n_toks == 4
    assert out["unchanged"].n_docs == 1 and out["unchanged"].n_toks == 2
    assert out["added"].n_docs == 1 and out["added"].n_toks == 2


# ---------------------------------------------------------------- fertility

def test_fertility_ppm(spark):
    # "hello world" -> 2 words; BPE-ish pieces: hell+o + worl+d = 4 pieces
    df = _docs(spark, [(1, "hello world", "en")])
    r = fertility(df, "text", "lang").collect()[0]
    assert r.n_words == 2 and r.n_pieces == 4
    assert r.fertility_ppm == 4 * PPM // 2


def test_fertility_groups_independent(spark):
    df = _docs(spark, [(1, "abcd", "en"), (2, "abcdefgh xy", "de")])
    out = {r.lang: r for r in fertility(df, "text", "lang").collect()}
    assert out["en"].n_words == 1 and out["en"].n_pieces == 1
    # abcdefgh -> abcd+efgh (2 pieces), xy -> 1 piece
    assert out["de"].n_words == 2 and out["de"].n_pieces == 3
