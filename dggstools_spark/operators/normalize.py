"""Text normalization: the canonical-form pass before dedup/fingerprinting.

CCNet and friends normalize text before computing dedup keys (lowercase,
strip punctuation/diacritics, collapse whitespace) so near-identical
byte-variants hash together.  This operator produces the normalized form
plus an observability report (chars removed, per-doc md5 of the normal
form) — the md5 is what downstream exact-dedup keys on.

Patterns live in the Java-regex ∩ RE2 subset (same contract as
operators/scrub.py) so the identical pattern text runs on Spark and
DuckDB and the oracle value-checks the normalized md5 of every document.
The alphabet rule is the aggressive dedup-key form: anything outside
[a-z0-9 ] becomes a space, then runs of spaces collapse.  (This is a
dedup KEY normalization, not a display transform.)

Scale design (100 TB): built-in string expressions only — whole-stage
codegen, one scan, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: identical pattern text on both engines (Java ∩ RE2)
NORM_DROP = "[^a-z0-9 ]"
NORM_SPACES = "  *"  # one-or-more without '+' quantifier ambiguity
NORM_PPM = 1_000_000


def normalize_expr(col: Column) -> Column:
    """The normalized-text column expression."""
    return F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(col), NORM_DROP, " "), NORM_SPACES, " "))


def normalize_sql(text: str) -> str:
    """DuckDB twin of normalize_expr (identical pattern chain)."""
    return (f"trim(regexp_replace(regexp_replace(lower({text}),"
            f" '{NORM_DROP}', ' ', 'g'), '{NORM_SPACES}', ' ', 'g'))")


def normalize_report(df: DataFrame, text_col: str,
                     id_col: str) -> DataFrame:
    """(id, chars_raw, chars_norm, removed_ppm, norm_md5) per document,
    with the normalized text as ``normalized``."""
    norm = normalize_expr(F.col(text_col))
    return (df.filter(F.col(text_col).isNotNull())
            .select(id_col,
                    F.length(text_col).cast("bigint").alias("chars_raw"),
                    norm.alias("normalized"))
            .withColumn("chars_norm",
                        F.length("normalized").cast("bigint"))
            .withColumn("removed_ppm", F.expr(
                f"CASE WHEN chars_raw > 0 THEN"
                f" ((chars_raw - chars_norm) * {NORM_PPM}) div chars_raw"
                f" ELSE 0 END"))
            .withColumn("norm_md5", F.md5("normalized")))


def normalize_report_sql(table: str, text_col: str, id_col: str) -> str:
    """DuckDB twin of normalize_report (minus the text column itself)."""
    norm = normalize_sql(text_col)
    return f"""
    WITH n AS (SELECT {id_col},
                      CAST(length({text_col}) AS BIGINT) AS chars_raw,
                      {norm} AS normalized
               FROM {table} WHERE {text_col} IS NOT NULL)
    SELECT {id_col}, chars_raw,
           CAST(length(normalized) AS BIGINT) AS chars_norm,
           CAST(CASE WHEN chars_raw > 0 THEN
                ((chars_raw - CAST(length(normalized) AS BIGINT))
                 * {NORM_PPM}) // chars_raw
                ELSE 0 END AS BIGINT) AS removed_ppm,
           md5(normalized) AS norm_md5
    FROM n
    """
