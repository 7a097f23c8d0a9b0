"""Temporal joins Spark lacks natively (SURVEY §2.6 "custom
operators" family): as-of join and range join.

Neither exists in Spark SQL (DuckDB has ASOF JOIN, `pandas.merge_asof`
exists single-node); both are staples of event/feature pipelines. The
implementations are pure DataFrame compositions — no pandas UDF, no
range-explosion cross join — chosen for the 100 TB posture:

- as-of join: union-of-sides + one window sort per key. One shuffle on
  (key), no per-row binary search, no broadcast requirement on either
  side. This is the standard log-merge rendering of as-of semantics.
- range join: interval binning. Intervals explode to the time bins
  they cover, points hash-join on (key, bin), then the exact range
  predicate filters — turning an inequality join Catalyst would
  nested-loop into an equi-join + filter. Bin width trades explode
  factor vs join selectivity.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _keys(on: str | Sequence[str]) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str = "ts",
    right_time: str = "ts",
    right_cols: Optional[Sequence[str]] = None,
    tolerance_seconds: Optional[float] = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_time <= left_time within the same key group (backward as-of,
    DuckDB `ASOF LEFT JOIN` semantics — ties at equal time match).

    Output: all left columns + right_cols renamed with `suffix` +
    `<right_time><suffix>` (the matched time, NULL if no match).
    `tolerance_seconds` nulls out matches older than the lookback.
    Multiple right rows at the same (key, time) tie-break
    deterministically to the greatest payload (lexicographic struct
    order over right_cols).
    """
    keys = _keys(on)
    rcols = [c for c in (right_cols or right.columns) if c not in keys and c != right_time]

    # union both sides: right rows carry a payload struct, left rows a
    # NULL payload. Sorting by (time, side) with right first at equal
    # times makes last(payload ignorenulls) over the running window
    # exactly the as-of match.
    payload = F.struct(
        F.col(right_time).cast("timestamp").alias("__rt"),
        *[F.col(c).alias(c) for c in rcols],
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).cast("timestamp").alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__rp"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).cast("timestamp").alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__rp"].dataType).alias("__rp"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    # __rp as the final sort key: multiple RIGHT rows at the same
    # (key, time) would otherwise make the match partition-order
    # nondeterministic (surfaced by the merge_asof differential
    # property test); struct ordering is lexicographic, so ties
    # resolve deterministically to the greatest payload.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__rp").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("__match", F.last("__rp", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )
    if tolerance_seconds is not None:
        # cast("double") keeps fractional seconds — unix_timestamp
        # truncates to whole seconds, which both keeps stale matches
        # (1.8s gap floored to 1s vs tolerance 1.0) and drops valid
        # ones under sub-second tolerances
        in_window = (
            F.col("__match").isNotNull()
            & (
                F.col("__t").cast("double") - F.col("__match.__rt").cast("double")
                <= F.lit(float(tolerance_seconds))
            )
        )
        matched = matched.withColumn(
            "__match", F.when(in_window, F.col("__match"))
        )
    return matched.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.col("__match.__rt").alias(f"{right_time}{suffix}"),
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in rcols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: str | Sequence[str] | None = None,
    bin_seconds: float = 3600.0,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    start <= point <= end (inclusive), optionally also matching equi
    keys `on`. Time columns may be timestamps (cast internally; the
    containment check compares the original values at full precision —
    epoch seconds are used only for bin assignment, where the
    floor-of-floor identity keeps truncation consistent).

    Implemented as interval binning: an interval covering N bins
    yields N index rows, points join on (keys…, bin) and the exact
    range predicate filters — a shuffle hash join instead of the
    nested-loop Catalyst produces for raw inequality joins. Pick
    `bin_seconds` near the typical interval length: much smaller
    explodes intervals, much larger degrades selectivity.
    """
    keys = _keys(on) if on else []
    p_epoch = F.unix_timestamp(F.col(point_col).cast("timestamp"))
    s_epoch = F.unix_timestamp(F.col(start_col).cast("timestamp"))
    e_epoch = F.unix_timestamp(F.col(end_col).cast("timestamp"))

    binned_i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(s_epoch / F.lit(bin_seconds)),
                F.floor(e_epoch / F.lit(bin_seconds)),
            )
        ),
    )
    binned_p = points.withColumn("__bin", F.floor(p_epoch / F.lit(bin_seconds)))
    cond = [binned_p["__bin"] == binned_i["__bin"]] + [
        binned_p[k] == binned_i[k] for k in keys
    ]
    joined = binned_p.join(binned_i, cond, "inner").where(
        (F.col(start_col) <= F.col(point_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    drop = [binned_i["__bin"], binned_p["__bin"]] + [binned_i[k] for k in keys]
    out = joined
    for c in drop:
        out = out.drop(c)
    return out
