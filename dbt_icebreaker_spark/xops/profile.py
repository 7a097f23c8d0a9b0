"""Dataset profiling (SURVEY §2.6 X-ops family).

The "what am I about to train on?" step: per-stratum distribution
stats over any numeric column. One hash-aggregate — Spark's exact
``percentile`` runs as a partial-aggregated sketch-merge (OpenHashMap
per partition, merged on the stratum key), so the profile is a single
shuffle of per-stratum state, not of rows, at any corpus size. For
columns with extreme cardinality at 100 TB, swap ``percentile`` for
``approx_percentile`` (t-digest) — same call shape, bounded state;
the exact form is the default because it is oracle-checkable
(matches DuckDB ``quantile_cont`` bit-for-bit — verified).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(
    df: DataFrame,
    strata_col: str,
    value_col: str,
    percentiles: Sequence[float] = (0.5, 0.95),
    approx: bool = False,
) -> DataFrame:
    """Per-stratum numeric profile: count, mean, min, max and the
    requested percentiles (p50/p95 by default, linear interpolation).

    Output: (stratum, n, avg_v, min_v, max_v, p<NN>...)."""
    fn = "approx_percentile" if approx else "percentile"
    aggs = [
        F.count("*").cast("long").alias("n"),
        F.avg(value_col).cast("double").alias("avg_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    ]
    for p in percentiles:
        name = f"p{int(round(p * 100)):02d}"
        aggs.append(
            F.expr(f"{fn}(`{value_col}`, {p!r})").cast("double").alias(name)
        )
    return df.groupBy(F.col(strata_col).alias("stratum")).agg(*aggs)


def profile_strings(
    df: DataFrame,
    cols: Sequence[str],
    top_k: int = 3,
    approx_distinct: bool = False,
) -> DataFrame:
    """String-column profile — the categorical half of "what am I
    about to train on": per column the row/null/distinct counts,
    average length, and the top-k most frequent values (ties broken
    by value for determinism).

    Output: (column, n, n_null, n_distinct, avg_len, top_values) with
    top_values an array of "value:count" strings, one row per column.

    Shape at scale: one unpivoted pass (stack) → a (column, value)
    groupBy whose partial aggregation collapses repeats map-side;
    the top-k is a per-column window over the distinct-value counts
    (cardinality-bound, not row-bound). ``approx_distinct=True``
    swaps exact distinct for HLL when cardinality itself is huge;
    exact is the default because it is oracle-checkable."""
    from pyspark.sql import Window

    stacked = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(c).cast("string").alias("value"),
                )
                for c in cols
            ])
        ).alias("s")
    ).select("s.column", "s.value")
    counts = stacked.groupBy("column", "value").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("column").orderBy(
        F.desc("cnt"), F.asc_nulls_last("value")
    )
    tops = (
        counts.where(F.col("value").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= top_k)
        .groupBy("column")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("__rn", F.concat_ws(":", "value", "cnt").alias("tv"))
                )
            ).alias("__tvs")
        )
        .select(
            "column",
            F.transform(F.col("__tvs"), lambda s: s["tv"]).alias("top_values"),
        )
    )
    distinct_fn = (
        F.approx_count_distinct("value") if approx_distinct
        else F.count_distinct("value")
    )
    stats = stacked.groupBy("column").agg(
        F.count("*").cast("long").alias("n"),
        F.count(F.when(F.col("value").isNull(), 1)).cast("long").alias("n_null"),
        distinct_fn.cast("long").alias("n_distinct"),
        F.avg(F.length("value")).cast("double").alias("avg_len"),
    )
    return stats.join(tops, ["column"], "left")
