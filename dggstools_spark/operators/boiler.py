"""HTML boilerplate removal: web-crawl text extraction signals.

The first transformation a web crawl sees (C4, RefinedWeb, trafilatura
practice): drop <script>/<style> payloads, strip markup, collapse
whitespace, and record link density (anchor-text chars / extracted chars
— boilerplate-heavy pages are link-dense, jusText's core signal).

Pattern dialect: everything lives in the Java-regex ∩ RE2 subset (no
backrefs, no lookaround; non-greedy `.*?` and the inline `(?s)` DOTALL
flag are in both), the same portability rule as operators/scrub.py — so
the identical pattern TEXT runs on Spark and DuckDB, and the oracle
value-checks the md5 of every extracted document.

Scale: one narrow projection of chained regexp_replace/regexp_count —
whole-stage codegen, zero shuffles, pushes to the scan stage.  This is a
per-row rewrite exactly like scrub_pii; corpus-level hygiene (dedup etc.)
composes downstream of it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: block elements whose CONTENT is boilerplate (payload dropped whole)
_BLOCK_PAT = r"(?s)<(script|style)[^>]*>.*?</(script|style)>"
#: any remaining tag
_TAG_PAT = r"<[^>]*>"
#: anchor text (group 1) — link-density numerator
_ANCHOR_PAT = r"(?s)<a[^>]*>(.*?)</a>"
#: whitespace runs collapse to one space (explicit class: Java's \s and
#: RE2's \s disagree on \x0B, so neither is used)
_WS_PAT = r"[ \t\r\n]+"
#: an opening anchor tag ('<a ' or bare '<a>')
_LINK_PAT = r"<a[ >]"


def extract_expr(col: Column) -> Column:
    """Extracted plain text: block payloads out, tags to spaces, runs of
    spaces collapsed, trimmed."""
    no_block = F.regexp_replace(col, _BLOCK_PAT, " ")
    no_tag = F.regexp_replace(no_block, _TAG_PAT, " ")
    return F.trim(F.regexp_replace(no_tag, _WS_PAT, " "))


def html_extract(df: DataFrame, html_col: str, id_col: str) -> DataFrame:
    """Per-document extraction report:
    (id_col, n_tags, n_links, anchor_chars, text_chars, link_ppm,
    extracted_md5) plus the extracted text itself as ``extracted``.

    link_ppm = round(1e6 * anchor_chars / text_chars) (0 for empty
    extraction) — the filter threshold a caller applies is corpus policy,
    not fixed here.
    """
    src = F.col(html_col)
    extracted = extract_expr(src)
    anchor_chars = F.length(F.array_join(
        F.regexp_extract_all(src, F.lit(_ANCHOR_PAT), 1), ""))
    out = df.select(
        id_col,
        F.regexp_count(src, F.lit(_TAG_PAT)).cast("long").alias("n_tags"),
        F.regexp_count(src, F.lit(_LINK_PAT)).cast("long").alias("n_links"),
        anchor_chars.cast("long").alias("anchor_chars"),
        extracted.alias("extracted"),
    )
    return out.select(
        id_col, "n_tags", "n_links", "anchor_chars",
        F.length("extracted").cast("long").alias("text_chars"),
        F.when(F.length("extracted") > 0,
               F.round(F.col("anchor_chars") * 1000000.0
                       / F.length("extracted")).cast("long"))
        .otherwise(F.lit(0)).alias("link_ppm"),
        "extracted",
        F.md5("extracted").alias("extracted_md5"),
    )


def _esc(pat: str) -> str:
    return pat.replace("'", "''")


def extract_sql(html: str) -> str:
    """DuckDB twin of extract_expr — identical pattern chain."""
    no_block = f"regexp_replace({html}, '{_esc(_BLOCK_PAT)}', ' ', 'g')"
    no_tag = f"regexp_replace({no_block}, '{_esc(_TAG_PAT)}', ' ', 'g')"
    return f"trim(regexp_replace({no_tag}, '{_esc(_WS_PAT)}', ' ', 'g'))"


def anchor_chars_sql(html: str) -> str:
    """DuckDB twin of the anchor-text char count."""
    return (f"CAST(length(array_to_string(regexp_extract_all({html}, "
            f"'{_esc(_ANCHOR_PAT)}', 1), '')) AS BIGINT)")


def count_sql(html: str, pat: str) -> str:
    """DuckDB twin of regexp_count."""
    return (f"CAST(len(regexp_extract_all({html}, '{_esc(pat)}')) "
            f"AS BIGINT)")
