"""Microbatch incremental strategy (dbt 1.9 contract).

Splits an event-time range into fixed windows (hour/day/month/year),
processes each window independently, and lands it with
insert_overwrite semantics on a window-derived partition column — so
every batch is idempotent (re-running a window replaces exactly that
window), failures are retryable per batch, and late data is handled
by re-processing a trailing ``lookback`` of windows on every run.

This is the 100 TB shape for event streams: each run touches only
the windows in scope (dynamic partition overwrite — see
``run_incremental(strategy="insert_overwrite")``), never the
accumulated table; a three-year backfill is just the same loop over
more windows, each bounded by window volume, not table volume.
"""

from __future__ import annotations

import datetime as _dt
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .incremental import run_incremental

_TRUNC = {"hour": "HOUR", "day": "DAY", "month": "MONTH", "year": "YEAR"}
_STEP = {
    "hour": _dt.timedelta(hours=1),
    "day": _dt.timedelta(days=1),
}

WINDOW_COL = "__event_window"


def _window_start(ts: _dt.datetime, batch_size: str) -> _dt.datetime:
    if batch_size == "hour":
        return ts.replace(minute=0, second=0, microsecond=0)
    if batch_size == "day":
        return ts.replace(hour=0, minute=0, second=0, microsecond=0)
    if batch_size == "month":
        return ts.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if batch_size == "year":
        return ts.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    raise ValueError(f"batch_size must be one of {sorted(_TRUNC)}")


def _next_window(ts: _dt.datetime, batch_size: str) -> _dt.datetime:
    if batch_size in _STEP:
        return ts + _STEP[batch_size]
    if batch_size == "month":
        return (ts.replace(day=28) + _dt.timedelta(days=4)).replace(day=1)
    return ts.replace(year=ts.year + 1)


def plan_batches(
    begin: _dt.datetime, end: _dt.datetime, batch_size: str
) -> list[tuple[_dt.datetime, _dt.datetime]]:
    """[begin, end) split into aligned windows — the dbt microbatch
    batch plan. First window is truncated-down to alignment so reruns
    always address whole windows."""
    out = []
    cur = _window_start(begin, batch_size)
    while cur < end:
        nxt = _next_window(cur, batch_size)
        out.append((cur, nxt))
        cur = nxt
    return out


def run_microbatch(
    spark: SparkSession,
    target: str,
    source: DataFrame | Callable[[_dt.datetime, _dt.datetime], DataFrame],
    event_time: str,
    batch_size: str = "day",
    begin: Optional[_dt.datetime] = None,
    end: Optional[_dt.datetime] = None,
    lookback: int = 0,
) -> list[dict]:
    """Process [begin, end) in ``batch_size`` windows.

    ``source`` is either a DataFrame (filtered per window here — with
    parquet sources the window predicate pushes to the scan, so each
    batch reads only its slice) or a callable ``(t0, t1) -> DataFrame``
    for models that need the bounds inside their SQL (dbt's
    ``__dbt_internal`` window filters).

    Defaults follow dbt: ``end`` = now (max event_time when a plain
    DataFrame is given), ``begin`` = max already-materialized window
    minus ``lookback`` windows (incremental run), or min event_time
    (first run / full backfill). Returns one stats dict per window.
    """
    is_df = isinstance(source, DataFrame)

    def _bounds_from_df(df: DataFrame) -> tuple[_dt.datetime, _dt.datetime]:
        row = df.agg(
            F.min(event_time).alias("mn"), F.max(event_time).alias("mx")
        ).collect()[0]
        if row.mn is None:
            raise ValueError("source has no rows / NULL event_time only")
        return row.mn, row.mx

    if begin is None or end is None:
        if spark.catalog.tableExists(target) and begin is None:
            last = spark.table(target).agg(F.max(WINDOW_COL)).collect()[0][0]
        else:
            last = None
        if is_df:
            mn, mx = _bounds_from_df(source)
        else:
            raise ValueError(
                "begin/end are required when source is a callable"
            )
        end = end or _next_window(_window_start(mx, batch_size), batch_size)
        if begin is None:
            if last is not None:
                begin = _window_start(last, batch_size)
                for _ in range(lookback):
                    prev = begin - _dt.timedelta(seconds=1)
                    begin = _window_start(prev, batch_size)
            else:
                begin = mn

    stats: list[dict] = []
    for t0, t1 in plan_batches(begin, end, batch_size):
        batch = source if is_df else source(t0, t1)
        windowed = (
            batch.filter(
                (F.col(event_time) >= F.lit(t0)) & (F.col(event_time) < F.lit(t1))
            )
            .withColumn(
                WINDOW_COL, F.date_trunc(_TRUNC[batch_size], F.col(event_time))
            )
        )
        s = run_incremental(
            spark,
            target,
            windowed,
            strategy="insert_overwrite",
            partition_by=WINDOW_COL,
            collect_stats=False,
        )
        stats.append({"window_start": t0.isoformat(), **s})
    return stats
