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


class TestHashSampling:
    """Deterministic sampling: membership must be a pure function of
    the id — stable under repartitioning and appends."""

    def test_stable_under_repartition(self, spark):
        from dbt_icebreaker_spark.xops.sampling import hash_sample

        df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        a = {r.doc_id for r in hash_sample(df, "doc_id", 0.3).collect()}
        b = {r.doc_id for r in hash_sample(df.repartition(13), "doc_id", 0.3).collect()}
        assert a == b
        assert 0.2 < len(a) / 2000 < 0.4

    def test_append_does_not_reshuffle_membership(self, spark):
        from dbt_icebreaker_spark.xops.sampling import hash_sample

        small = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
        big = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        a = {r.doc_id for r in hash_sample(small, "doc_id", 0.3).collect()}
        b = {r.doc_id for r in hash_sample(big, "doc_id", 0.3).collect()}
        assert a == {x for x in b if x < 1000}

    def test_salt_changes_sample(self, spark):
        from dbt_icebreaker_spark.xops.sampling import hash_sample

        df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        a = {r.doc_id for r in hash_sample(df, "doc_id", 0.3, salt=0).collect()}
        b = {r.doc_id for r in hash_sample(df, "doc_id", 0.3, salt=1).collect()}
        assert a != b

    def test_split_partitions_and_proportions(self, spark):
        from dbt_icebreaker_spark.xops.sampling import train_val_test_split

        df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
        out = train_val_test_split(df, "doc_id", weights=(0.8, 0.1, 0.1))
        counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
        assert set(counts) == {"train", "val", "test"}
        assert sum(counts.values()) == 5000
        assert 0.75 < counts["train"] / 5000 < 0.85

    def test_no_shuffle_in_plan(self, spark):
        from dbt_icebreaker_spark.xops.sampling import hash_sample

        df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
        plan = hash_sample(df, "doc_id", 0.5)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestPackSequences:
    def test_budget_overrun_bounded_by_one_doc(self, spark):
        from dbt_icebreaker_spark.xops.text import pack_sequences

        docs = spark.createDataFrame(
            [(i, " ".join(["w"] * (10 + i % 37))) for i in range(200)],
            "doc_id long, text string",
        )
        out = pack_sequences(docs, "doc_id", "text", budget_tokens=100, n_shards=4)
        rows = out.collect()
        packs = {}
        for r in rows:
            packs.setdefault((r.shard, r.pack_id), []).append(r.n_tokens)
        for (_, _), toks in packs.items():
            # chunking semantics: total minus the last doc fits the budget
            assert sum(toks) - max(toks) < 100 + max(toks)
        # every doc assigned exactly once
        assert len(rows) == 200

    def test_deterministic_across_partitionings(self, spark):
        from dbt_icebreaker_spark.xops.text import pack_sequences

        docs = spark.createDataFrame(
            [(i, " ".join(["w"] * (5 + i % 11))) for i in range(100)],
            "doc_id long, text string",
        )
        a = {(r.doc_id, r.pack_id) for r in pack_sequences(docs, "doc_id", "text", 64, 4).collect()}
        b = {(r.doc_id, r.pack_id) for r in pack_sequences(docs.repartition(7), "doc_id", "text", 64, 4).collect()}
        assert a == b
