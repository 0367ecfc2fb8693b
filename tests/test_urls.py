"""URL canonicalization + URL-tier dedup (round 6, batch 23)."""

import duckdb
from pyspark.sql import functions as F

from dggstools_spark.operators.urls import (canonical_url_expr,
                                            canonical_url_sql, url_dedup)

CASES = [
    ("http://Site1.com/Page/2", "site1.com/page/2"),
    ("https://www.site1.com/page/2/", "site1.com/page/2"),
    ("HTTP://WWW.site1.com/page/2#frag", "site1.com/page/2"),
    ("https://site1.com/page/2?utm_source=x&utm_medium=y",
     "site1.com/page/2"),
    ("https://site1.com/page/2?ref=4&utm_campaign=x",
     "site1.com/page/2?ref=4"),
    ("https://site1.com/page/2?utm_source=x&ref=4",
     "site1.com/page/2?ref=4"),
    ("http://other.org", "other.org"),
]


def test_canonicalization_cases_both_engines(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)],
                               "i long, url string")
    got = {r.i: r.c for r in df.select(
        "i", canonical_url_expr(F.col("url")).alias("c")).collect()}
    assert got == {i: want for i, (_, want) in enumerate(CASES)}
    con = duckdb.connect()
    for raw, want in CASES:
        esc = raw.replace("'", "''")
        o = con.execute(
            "SELECT " + canonical_url_sql(f"'{esc}'")).fetchone()[0]
        assert o == want, (raw, o, want)


def test_url_dedup_groups(spark):
    # four spellings of one page + one distinct page
    rows = [(0, "http://a.com/x"), (1, "https://a.com/x/"),
            (2, "https://www.a.com/x#f"), (3, "http://a.com/x?utm_source=z"),
            (4, "http://a.com/y")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r.canon_url: (r.n_dups, r.keep_id)
           for r in url_dedup(df, "url", "doc_id").collect()}
    assert out == {"a.com/x": (4, 0), "a.com/y": (1, 4)}
