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
