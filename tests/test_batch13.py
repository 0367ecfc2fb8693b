"""Mixture planning + text normalization + dup profile (round 5, batch 13)."""

import hashlib
import math

from dggstools_spark.operators.mixture import dup_profile, mixture_plan
from dggstools_spark.operators.normalize import normalize_report

PPM = 1_000_000


def _docs(spark, rows, schema="doc_id long, text string, source string"):
    return spark.createDataFrame(rows, schema)


# -------------------------------------------------------------- mixture_plan

def test_mixture_plan_hand_computed(spark):
    # src a: 9 tokens of 12 total; src b: 3 of 12
    df = _docs(spark, [(1, "t " * 8 + "t", "a"), (2, "t t t", "b")])
    out = {r.source: r for r in mixture_plan(df, "text", "source").collect()}
    assert out["a"].n_toks == 9 and out["b"].n_toks == 3
    sa, sb = 9 * PPM // 12, 3 * PPM // 12
    assert out["a"].share_ppm == sa and out["b"].share_ppm == sb
    qa = round(math.sqrt(sa / PPM) * PPM)
    qb = round(math.sqrt(sb / PPM) * PPM)
    assert out["a"].weight_ppm == qa * PPM // (qa + qb)
    assert out["b"].weight_ppm == qb * PPM // (qa + qb)


def test_mixture_plan_flattens_skew(spark):
    # α=1/2 temperature must boost the low-resource source's weight above
    # its raw share
    df = _docs(spark, [(1, "t " * 99 + "t", "big"), (2, "t", "small")])
    out = {r.source: r for r in mixture_plan(df, "text", "source").collect()}
    assert out["small"].weight_ppm > out["small"].share_ppm
    assert out["big"].weight_ppm < out["big"].share_ppm


# ------------------------------------------------------------ text_normalize

def test_normalize_report_strips_and_hashes(spark):
    df = _docs(spark, [(1, "Hello,  WORLD! (v2)", "s")])
    r = normalize_report(df, "text", "doc_id").collect()[0]
    assert r.normalized == "hello world v2"
    assert r.norm_md5 == hashlib.md5(b"hello world v2").hexdigest()
    assert r.chars_raw == 19 and r.chars_norm == 14
    assert r.removed_ppm == (19 - 14) * PPM // 19


def test_normalize_identity_on_clean_text(spark):
    df = _docs(spark, [(1, "already clean text 42", "s")])
    r = normalize_report(df, "text", "doc_id").collect()[0]
    assert r.removed_ppm == 0
    assert r.norm_md5 == hashlib.md5(b"already clean text 42").hexdigest()


def test_normalize_empty_after_strip(spark):
    df = _docs(spark, [(1, "!!! ???", "s")])
    r = normalize_report(df, "text", "doc_id").collect()[0]
    assert r.chars_norm == 0 and r.norm_md5 == hashlib.md5(b"").hexdigest()


# ---------------------------------------------------------------- dup_profile

def test_dup_profile_counts_normalized_dups(spark):
    df = _docs(spark, [(1, "aa bb", "s1"), (2, "  AA BB  ", "s1"),
                       (3, "cc", "s1"), (4, "dd", "s2")])
    out = {r.source: r for r in
           dup_profile(df, "text", "doc_id", "source").collect()}
    # md5(lower(trim())) merges docs 1 and 2
    assert out["s1"].n_docs == 3 and out["s1"].n_distinct == 2
    assert out["s1"].dup_ppm == 1 * PPM // 3
    assert out["s2"].dup_ppm == 0
