"""Deterministic sampling operators for training-data pipelines.

At 100 TB, `df.sample()` is the wrong tool: Spark's Bernoulli sample draws
from a PER-PARTITION seeded RNG, so the selected set changes whenever
partitioning, task retries, or input split sizes change — a resumed or
re-run pipeline silently trains on a different corpus.  These operators
key selection off a HASH OF THE ROW'S OWN KEY instead: selection is a pure
function of content, reproducible across runs, engines (the DuckDB oracles
share the md5 preimage), partitionings, and retries, and sample membership
can be re-derived later (audit: "why is this doc in the training set?").

- hash_sample:        Bernoulli(rate) via a 12-hex-digit md5 prefix
                      threshold — one narrow projection + filter, no
                      shuffle, fully pushed into the scan stage.
- stratified_sample:  EXACT per-stratum quotas via hash-rank: row_number
                      over (stratum, order by md5) <= quota.  Spark >= 3.5
                      plans a partial WindowGroupLimit BEFORE the shuffle
                      (CLAUDE.md constraint 9), so each map task forwards
                      at most `quota` rows per stratum — the shuffle
                      carries O(strata x quota x tasks), not the corpus.
- weighted_mixture:   deterministic source-mixing: per-source hash
                      thresholds scale each source's keep-rate so the
                      OUTPUT approximates the requested mixture weights —
                      the "data recipe" step of LLM corpus assembly,
                      again content-keyed so the recipe is reproducible.

No reference counterpart (the reference has no sampling layer); this is
part of the engine's LLM-data-pipeline surface like operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: hex digits of the md5 prefix used for thresholding; 12 -> rate
#: granularity of 16^-12 ~ 3.6e-15, far below any meaningful rate
_HEX_DIGITS = 12


def _threshold_hex(rate: float) -> str:
    """Lower-case hex threshold string t such that
    P[md5_prefix < t] == rate (up to 16^-12): portable to any engine with
    md5 — string comparison on lower-case hex IS numeric comparison."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    v = int(rate * (16 ** _HEX_DIGITS))
    if v >= 16 ** _HEX_DIGITS:
        # rate == 1.0 would need a 13-char threshold, which lexicographic
        # compare mishandles against 12-char prefixes; 'g' sorts after
        # every hex digit in both engines -> keeps every non-null row
        return "g"
    return format(v, f"0{_HEX_DIGITS}x")


def _hash_prefix(key_col: str, salt: str) -> "F.Column":
    return F.substring(F.md5(F.concat(F.lit(salt + ":"),
                                      F.col(key_col).cast("string"))),
                       1, _HEX_DIGITS)


def hash_sample(df: DataFrame, key_col: str, rate: float,
                salt: str = "s0") -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key_col``.

    ``salt`` decorrelates successive samples over the same corpus (two
    salts give independent samples; the SAME salt gives the SAME sample —
    that is the point).  NULL keys are never selected (md5(NULL) is NULL).
    Selection is a row-local predicate: no shuffle, survives pushdown into
    the scan stage, and a resumed/retried job selects the identical set."""
    return df.filter(_hash_prefix(key_col, salt) < _threshold_hex(rate))


def stratified_sample(df: DataFrame, strata_col: str, key_col: str,
                      quota: int, salt: str = "s0") -> DataFrame:
    """EXACTLY min(quota, |stratum|) rows per stratum, chosen uniformly by
    hash rank — deterministic given unique ``key_col`` values (duplicate
    keys tie-break by the key itself, still deterministic; rows identical
    in both columns are interchangeable).

    Plan shape at scale: md5 projection -> window row_number per stratum.
    Spark >= 3.5 inserts a PARTIAL WindowGroupLimit below the shuffle, so
    each map task emits at most ``quota`` rows per stratum; the shuffle and
    the final rank see O(strata x quota x tasks) rows, not the corpus.  No
    per-stratum count pre-pass, no second scan — one job."""
    from pyspark.sql.window import Window

    h = _hash_prefix(key_col, salt)
    w = Window.partitionBy(strata_col).orderBy("_h", key_col)
    return (df.withColumn("_h", h)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= quota)
            .drop("_h", "_rn"))


def weighted_mixture(df: DataFrame, source_col: str, key_col: str,
                     weights: "dict[str, float]", total_rate: float = 1.0,
                     salt: str = "s0") -> DataFrame:
    """Deterministic mixture sampling: keep each source at a rate
    proportional to ``weights[source] / max(weights)`` (scaled by
    ``total_rate``), so the LARGEST-weight source is kept at
    ``total_rate`` and the rest are thinned relative to it.  Sources
    absent from ``weights`` are dropped.  Rates are applied with the same
    content-keyed threshold as hash_sample, so the recipe is reproducible
    row-for-row.  NOTE this scales INPUT rates, not output shares — to hit
    exact output shares, derive weights from known per-source sizes
    upstream (sizes require a count pre-pass this operator deliberately
    avoids)."""
    if not weights:
        raise ValueError("weights must be non-empty")
    wmax = max(weights.values())
    if wmax <= 0:
        raise ValueError("weights must contain a positive value")
    thresholds = {s: _threshold_hex(total_rate * w / wmax)
                  for s, w in weights.items()}
    thr = F.create_map(*[F.lit(v) for kv in thresholds.items() for v in kv])
    return (df.filter(F.col(source_col).isin(list(weights)))
            .filter(_hash_prefix(key_col, salt) < thr[F.col(source_col)]))
