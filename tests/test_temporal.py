"""As-of join and range join semantics (xops/temporal)."""

from __future__ import annotations

import datetime as dt

from dbt_icebreaker_spark.xops.temporal import asof_join, range_join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, _ts(10), "p10"), (1, _ts(5), "p5"), (2, _ts(7), "p7")],
            "k long, ts timestamp, lv string",
        )
        right = spark.createDataFrame(
            [(1, _ts(3), "r3"), (1, _ts(10), "r10"), (2, _ts(8), "r8")],
            "k long, ts timestamp, rv string",
        )
        return left, right

    def test_backward_match_and_tie(self, spark):
        left, right = self._frames(spark)
        out = asof_join(left, right, on="k", right_cols=["rv"])
        got = {(r.k, r.lv): (r.rv_r, r.ts_r) for r in out.collect()}
        assert got[(1, "p5")] == ("r3", _ts(3))
        # tie at equal time matches (DuckDB ASOF semantics: >=)
        assert got[(1, "p10")] == ("r10", _ts(10))
        # right row strictly after the left row never matches
        assert got[(2, "p7")] == (None, None)

    def test_left_rows_all_preserved(self, spark):
        left, right = self._frames(spark)
        out = asof_join(left, right, on="k", right_cols=["rv"])
        assert out.count() == left.count()
        assert set(left.columns) <= set(out.columns)

    def test_tolerance_nulls_stale_matches(self, spark):
        left, right = self._frames(spark)
        out = asof_join(left, right, on="k", right_cols=["rv"], tolerance_seconds=1.0)
        got = {(r.k, r.lv): r.rv_r for r in out.collect()}
        assert got[(1, "p5")] is None  # r3 is 2s old, beyond 1s lookback
        assert got[(1, "p10")] == "r10"  # 0s old

    def test_empty_right_side(self, spark):
        left, right = self._frames(spark)
        out = asof_join(left, right.limit(0), on="k", right_cols=["rv"])
        assert out.count() == 3
        assert all(r.rv_r is None for r in out.collect())


class TestRangeJoin:
    def test_inclusive_bounds_and_bin_crossing(self, spark):
        points = spark.createDataFrame(
            [(1, _ts(0)), (2, _ts(50)), (3, _ts(100)), (4, _ts(101)), (5, _ts(7000))],
            "pid long, ts timestamp",
        )
        intervals = spark.createDataFrame(
            [(10, _ts(0), _ts(100)), (11, _ts(6990), _ts(7200))],
            "iid long, start_ts timestamp, end_ts timestamp",
        )
        # bin smaller than the interval: intervals span multiple bins
        out = range_join(points, intervals, "ts", "start_ts", "end_ts", bin_seconds=30.0)
        got = {(r.pid, r.iid) for r in out.collect()}
        assert got == {(1, 10), (2, 10), (3, 10), (5, 11)}  # bounds inclusive; 101 excluded

    def test_equi_key_restricts(self, spark):
        points = spark.createDataFrame(
            [(1, 1, _ts(5)), (2, 2, _ts(5))], "pid long, k long, ts timestamp"
        )
        intervals = spark.createDataFrame(
            [(1, _ts(0), _ts(10))], "k long, start_ts timestamp, end_ts timestamp"
        )
        out = range_join(
            points, intervals, "ts", "start_ts", "end_ts", on="k", bin_seconds=60.0
        )
        assert [r.pid for r in out.collect()] == [1]

    def test_overlapping_intervals_multiply(self, spark):
        points = spark.createDataFrame([(1, _ts(5))], "pid long, ts timestamp")
        intervals = spark.createDataFrame(
            [(10, _ts(0), _ts(10)), (11, _ts(4), _ts(6))],
            "iid long, start_ts timestamp, end_ts timestamp",
        )
        out = range_join(points, intervals, "ts", "start_ts", "end_ts", bin_seconds=60.0)
        assert {r.iid for r in out.collect()} == {10, 11}
