"""PII scrubbing: regex redaction of emails / IPv4s / long digit runs.

The pre-training privacy pass (public practice: C4's blocklist scrub, the
BigScience ROOTS redaction pipeline): replace personally-identifying
patterns with fixed placeholder tokens and report per-document match
counts so the redaction rate is observable.

All patterns are written in the common subset of Java regex (Spark) and
RE2 (DuckDB) — no backrefs, no lookaround — so the identical pattern text
runs on both engines and the oracle can value-check both the counts AND
the md5 of the scrubbed text.  Everything is built-in string expressions:
whole-stage codegen, one scan, zero shuffles for the scrub itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: (name, pattern, replacement) — order matters: emails first so their
#: digit runs are not half-eaten by the digit-run rule
PII_RULES: "tuple[tuple[str, str, str], ...]" = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    # phone-ish: 9+ digit runs with optional separators (conservative)
    ("digits", r"\b[0-9][0-9 ()+.-]{7,}[0-9]\b", "<NUM>"),
)


def scrub_expr(col: Column) -> Column:
    """The scrubbed-text column expression (chained regexp_replace)."""
    out = col
    for _, pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document scrub report: (id_col, n_<rule> per rule, scrubbed_md5)
    plus the scrubbed text itself as ``scrubbed``.  Counts are computed on
    the ORIGINAL text per rule (before any replacement), so they report
    true occurrence counts even when rules overlap textually."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        .alias(f"n_{name}")
        for name, pat, _ in PII_RULES
    ]
    scrubbed = scrub_expr(F.col(text_col))
    return df.select(
        id_col, *counts,
        scrubbed.alias("scrubbed"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


def scrub_sql(text: str) -> str:
    """DuckDB twin of scrub_expr — identical pattern/replacement chain.
    RE2 and Java regex agree on this pattern subset (tested via the
    driver-contract oracle)."""
    out = text
    for _, pat, repl in PII_RULES:
        esc = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{esc}', '{repl}', 'g')"
    return out


def count_sql(text: str, rule: str) -> str:
    """DuckDB twin of the per-rule occurrence count."""
    pat = {n: p for n, p, _ in PII_RULES}[rule].replace("'", "''")
    return f"CAST(len(regexp_extract_all({text}, '{pat}')) AS BIGINT)"
