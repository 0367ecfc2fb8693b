"""Text-analysis primitives for the training-data pipeline, as portable SQL
snippets (identical semantics in Spark and DuckDB — the same text is used by
the queries and by the DuckDB oracle).

Only replace/length/lower/trim/md5/CASE arithmetic is used: no regex (engine
dialects differ) and no Python in the hot path."""

from __future__ import annotations


def occurrences(text: str, needle: str) -> str:
    """# of occurrences of a literal needle."""
    esc = needle.replace("'", "''")
    return (f"CAST((length({text}) - length(replace({text}, '{esc}', '')))"
            f" / {len(needle)} AS INT)")


def token_count(text: str) -> str:
    """Whitespace token count (single-space convention of the synthetic corpus)."""
    return (f"CASE WHEN length(trim({text})) = 0 THEN 0 "
            f"ELSE length(trim({text})) - length(replace(trim({text}), ' ', '')) + 1 END")


def punct_ratio(text: str) -> str:
    parts = " + ".join(occurrences(text, p) for p in (".", ",", "!", "?", ";"))
    return f"CAST({parts} AS DOUBLE) / greatest(length({text}), 1)"


def quality_score(text: str) -> str:
    """Simple length/punct/stopword quality heuristic in [0, 1], rounded to a
    stable 6 decimals so cross-engine float hashing is deterministic."""
    toks = token_count(text)
    stop = " + ".join(occurrences(f"lower({text})", f" {w} ")
                      for w in ("the", "and", "of", "a", "in"))
    return (
        f"round(least(1.0, CAST({toks} AS DOUBLE) / 64.0) * 0.5"
        f" + least(1.0, CAST({stop} AS DOUBLE) / 8.0) * 0.3"
        f" + least(1.0, {punct_ratio(text)} * 20.0) * 0.2, 6)"
    )


LANG_MARKERS = {
    "en": (" the ", " and ", " is "),
    "es": (" el ", " la ", " que "),
    "de": (" der ", " und ", " die "),
    "fr": (" le ", " et ", " les "),
}


def lang_score(text: str, lang: str) -> str:
    return " + ".join(occurrences(f"lower({text})", m) for m in LANG_MARKERS[lang])


def lang_id(text: str) -> str:
    """argmax over marker-stopword hit counts; 'und' (undetermined) when all 0."""
    scores = {lang: lang_score(text, lang) for lang in LANG_MARKERS}
    pairs = ", ".join(scores.values())
    best = f"greatest({pairs})"
    branches = " ".join(
        f"WHEN ({scores[lang]}) = {best} THEN '{lang}'" for lang in LANG_MARKERS
    )
    return f"CASE WHEN {best} = 0 THEN 'und' {branches} END"


def fingerprint(text: str) -> str:
    """Document fingerprint: md5 of the lower-cased, trimmed text (portable)."""
    return f"md5(lower(trim({text})))"


def shingle_minhash(text: str, seed: int) -> str:
    """One MinHash band value: lexicographic min of md5(seed || token) over
    whitespace tokens.  Expressed portably downstream via explode/unnest;
    this helper only builds the per-token hash expression."""
    return f"md5(concat('{seed}:', tok))"


BPE_PIECE_PATTERN = "[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9 ]"


def token_count_bpe_spark(text: str) -> str:
    """Spark SQL: subword-ish token count — letter pieces of <= 4 chars,
    single digits, single punctuation marks (a deterministic BPE-inflation
    proxy; greedy leftmost matching gives identical piece counts in any
    regex engine for this pattern class)."""
    return f"size(regexp_extract_all({text}, '{BPE_PIECE_PATTERN}', 0))"


def token_count_bpe_duckdb(text: str) -> str:
    """DuckDB twin of token_count_bpe_spark."""
    return f"len(regexp_extract_all({text}, '{BPE_PIECE_PATTERN}'))"
