"""Exact corpus-distribution statistics (per-group percentile profile).

The production question "what does the token-length distribution of each
language / source slice look like" needs EXACT percentiles for
reproducibility (approx_percentile's sketch merge varies with partitioning
— same reason ADVICE r4 rejected it for the winnow cap).  The naive exact
plan is a per-group sort of every row (O(N log N) shuffle at 100 TB).

This operator instead aggregates the VALUE DISTRIBUTION first:
groupBy(group, value) -> counts is one map-side-combining shuffle whose
output is |distinct values| rows (token counts are small integers — the
distribution table is ~10^3 rows per group regardless of corpus size).
The cumulative window and the percentile selection then run over that tiny
table.  Exactness at distribution-table cost.

Percentile rule (type-1 / lower quantile): p_q = the smallest value v with
cum_count(v) >= ceil(q * n).  ceil is computed in INTEGER arithmetic
((n*num + den - 1) div den) so engines can't disagree on float rounding
(0.9 * 10 is 9.000000000000002 in binary — float ceil would give 10).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _qtag(q: float) -> str:
    """0.5 -> p50, 0.99 -> p99, 0.999 -> p99_9."""
    return ("p%g" % (q * 100)).replace(".", "_")


def distribution_percentiles(df: DataFrame, group_col: str, value_col: str,
                             quantiles: "tuple[float, ...]" = (0.5, 0.9, 0.99),
                             ) -> DataFrame:
    """Per group: (group, n_rows, sum_value, min/max value, p<q> for each
    quantile).  Exact, run-stable, distribution-table sized."""
    dist = (df.groupBy(group_col, value_col)
            .agg(F.count("*").alias("_cnt")))
    w_cum = (Window.partitionBy(group_col).orderBy(value_col)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = (Window.partitionBy(group_col)
             .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    cum = (dist
           .withColumn("_cum", F.sum("_cnt").over(w_cum))
           .withColumn("_tot", F.sum("_cnt").over(w_all)))
    aggs = [
        F.max("_tot").alias("n_rows"),
        F.sum(F.col(value_col) * F.col("_cnt")).alias(f"sum_{value_col}"),
        F.min(value_col).alias(f"min_{value_col}"),
        F.max(value_col).alias(f"max_{value_col}"),
    ]
    for q in quantiles:
        fr = Fraction(q).limit_denominator(10000)
        num, den = fr.numerator, fr.denominator
        pos = F.expr(f"(_tot * {num} + {den} - 1) div {den}")
        tag = _qtag(q)
        aggs.append(
            F.min(F.when(F.col("_cum") >= pos, F.col(value_col)))
            .alias(f"{tag}_{value_col}"))
    return cum.groupBy(group_col).agg(*aggs)


def percentile_sql(table_expr: str, group_col: str, value_sql: str,
                   value_name: str,
                   quantiles: "tuple[float, ...]" = (0.5, 0.9, 0.99)) -> str:
    """The identical construction as DuckDB SQL (shared-snippet rule: the
    oracle runs THIS text, so the keep/ceil semantics can't drift)."""
    parts = []
    for q in quantiles:
        fr = Fraction(q).limit_denominator(10000)
        num, den = fr.numerator, fr.denominator
        tag = _qtag(q)
        parts.append(
            f"min(CASE WHEN _cum >= (_tot * {num} + {den} - 1) // {den} "
            f"THEN _val END) AS {tag}_{value_name}")
    sel = ",\n           ".join(parts)
    return f"""
    WITH _base AS (SELECT {group_col}, {value_sql} AS _val FROM {table_expr}),
    _dist AS (SELECT {group_col}, _val, count(*) AS _cnt
              FROM _base GROUP BY {group_col}, _val),
    _cum AS (SELECT {group_col}, _val, _cnt,
                    sum(_cnt) OVER (PARTITION BY {group_col} ORDER BY _val
                                    ROWS UNBOUNDED PRECEDING) AS _cum,
                    sum(_cnt) OVER (PARTITION BY {group_col}) AS _tot
             FROM _dist)
    SELECT {group_col},
           CAST(max(_tot) AS BIGINT) AS n_rows,
           CAST(sum(_val * _cnt) AS BIGINT) AS sum_{value_name},
           min(_val) AS min_{value_name},
           max(_val) AS max_{value_name},
           {sel}
    FROM _cum GROUP BY {group_col}
    """
