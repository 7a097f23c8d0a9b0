"""Tests: DAG project runner, streaming pipeline, iceberg conf."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dbt_icebreaker_spark import IcebreakerEngine
from dbt_icebreaker_spark.project import ModelDef, ProjectRunner
from dbt_icebreaker_spark.sources import register_dir, read_parquet

SF = "/root/testdata/sf0.001"


class TestProjectRunner:
    def test_dag_run_with_dependencies(self, spark, tmp_path):
        register_dir(spark, SF)
        engine = IcebreakerEngine(spark, schema="proj_test")
        runner = ProjectRunner(engine, threads=2, state_dir=str(tmp_path))
        models = [
            ModelDef("stg_orders", "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"),
            ModelDef(
                "cust_totals",
                "SELECT o_custkey, SUM(o_totalprice) AS total FROM proj_test.stg_orders GROUP BY 1",
                depends_on=["stg_orders"],
            ),
            ModelDef(
                "top_cust",
                "SELECT * FROM proj_test.cust_totals QUALIFY ROW_NUMBER() OVER (ORDER BY total DESC) <= 5",
                depends_on=["cust_totals"],
            ),
            ModelDef("independent", "SELECT 1 AS x"),
        ]
        session = runner.run(models)
        assert session["failed"] == []
        assert session["n_models"] == 4
        assert spark.table("proj_test.top_cust").count() == 5
        # savings logged per model
        assert runner.savings.summary()["runs"] == 4

    def test_failed_model_skips_downstream(self, spark, tmp_path):
        engine = IcebreakerEngine(spark, schema="proj_test")
        runner = ProjectRunner(engine, threads=2, state_dir=str(tmp_path))
        models = [
            ModelDef("bad", "SELECT * FROM table_that_does_not_exist_xyz"),
            ModelDef("child_of_bad", "SELECT * FROM proj_test.bad", depends_on=["bad"]),
            ModelDef("ok_model", "SELECT 2 AS y"),
        ]
        session = runner.run(models)
        assert "bad" in session["failed"]
        assert "child_of_bad" in session["failed"]
        assert "ok_model" not in session["failed"]
        statuses = {m["model"]: m["status"] for m in session["models"]}
        assert statuses["child_of_bad"] == "skipped"
        # WAL recorded the failure
        assert runner.wal.crash_count("bad") == 1


class TestStreaming:
    @pytest.fixture()
    def events_dir(self, spark, tmp_path):
        # stage events parquet as a stream source dir (normalized ns→µs)
        src = str(tmp_path / "events_src")
        read_parquet(spark, f"{SF}/events.parquet").write.parquet(src)
        return src

    def test_stream_incremental_append_availablenow(self, spark, tmp_path, events_dir):
        from dbt_icebreaker_spark.streaming import stream_incremental_append

        target = "stream_test.events_inc"
        spark.sql("CREATE DATABASE IF NOT EXISTS stream_test")
        spark.sql(f"DROP TABLE IF EXISTS {target}")
        ckpt = str(tmp_path / "ckpt")
        stream_incremental_append(
            spark, events_dir, target, ckpt,
            transform_sql="SELECT event_id, user_id, event_type, value, props:k::INT AS k FROM stream_source WHERE value > 5",
        )
        batch_n = (
            read_parquet(spark, f"{SF}/events.parquet").filter("value > 5").count()
        )
        assert spark.table(target).count() == batch_n

        # exactly-once: re-running with same checkpoint adds nothing
        stream_incremental_append(
            spark, events_dir, target, ckpt,
            transform_sql="SELECT event_id, user_id, event_type, value, props:k::INT AS k FROM stream_source WHERE value > 5",
        )
        assert spark.table(target).count() == batch_n

    def test_windowed_counts_batch_parity(self, spark):
        from dbt_icebreaker_spark.streaming import windowed_counts

        events = read_parquet(spark, f"{SF}/events.parquet")
        out = windowed_counts(events, window="1 day", watermark="2 days")
        total = out.agg(F.sum("n")).collect()[0][0]
        assert total == events.count()
        # window boundaries aligned to day
        row = out.orderBy("window_start").first()
        assert row.window_start.hour == 0

    def test_sessionize_batch(self, spark):
        from dbt_icebreaker_spark.streaming.pipeline import sessionize_batch

        events = read_parquet(spark, f"{SF}/events.parquet").select(
            "user_id", "ts", "value"
        )
        sessions = sessionize_batch(events, gap_seconds=3600)
        # every event lands in exactly one session
        assert sessions.agg(F.sum("n_events")).collect()[0][0] == events.count()
        # session invariant: start <= end
        bad = sessions.filter(F.col("session_start") > F.col("session_end")).count()
        assert bad == 0

    def test_sessionize_streaming_stateful(self, spark, tmp_path, events_dir):
        """applyInPandasWithState end-to-end over a file stream."""
        from dbt_icebreaker_spark.streaming import sessionize

        stream = (
            spark.readStream.schema(
                read_parquet(spark, f"{SF}/events.parquet").schema
            )
            .parquet(events_dir)
            .select("user_id", "ts", "value")
        )
        sessions = sessionize(stream, gap_seconds=3600)
        q = (
            sessions.writeStream.outputMode("append")
            .format("memory")
            .queryName("sessions_out")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.sql("SELECT * FROM sessions_out")
        # closed sessions only (open ones wait for timeout) — at least
        # some users have >1 session with a 1h gap in the fixture
        assert out.count() > 0
        assert set(out.columns) == {
            "user_id", "session_start", "session_end", "n_events", "total_value",
        }


class TestIceberg:
    def test_catalog_conf_rest(self):
        from dbt_icebreaker_spark.iceberg import IcebergConfig, catalog_conf

        conf = catalog_conf(
            IcebergConfig(
                catalog_name="lake",
                catalog_type="rest",
                uri="https://catalog.example/v1",
                warehouse="s3://bucket/wh",
                token="tok",
                s3_access_key="ak",
                s3_secret_key="sk",
            )
        )
        assert conf["spark.sql.catalog.lake"] == "org.apache.iceberg.spark.SparkCatalog"
        assert conf["spark.sql.catalog.lake.type"] == "rest"
        assert conf["spark.sql.catalog.lake.uri"] == "https://catalog.example/v1"
        assert conf["spark.hadoop.fs.s3a.access.key"] == "ak"

    def test_bad_catalog_type_rejected(self):
        from dbt_icebreaker_spark.iceberg import IcebergConfig, catalog_conf

        with pytest.raises(ValueError):
            catalog_conf(IcebergConfig(catalog_type="dynamo"))

    def test_attach_without_runtime_actionable(self, spark):
        from dbt_icebreaker_spark.iceberg import (
            IcebergConfig,
            attach_catalog,
            runtime_available,
        )

        if runtime_available(spark):
            pytest.skip("iceberg runtime present")
        with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
            attach_catalog(spark, IcebergConfig())


class TestStreamDedup:
    def test_stream_dedup_within_watermark(self, spark, tmp_path):
        """File stream with duplicated sends → one row per key."""
        from dbt_icebreaker_spark.streaming.pipeline import stream_dedup

        # duplicate the whole source once (at-least-once delivery twin)
        dup_dir = str(tmp_path / "events_dup")
        base = read_parquet(spark, f"{SF}/events.parquet")
        base.write.parquet(dup_dir)
        base.write.mode("append").parquet(dup_dir)

        stream = (
            spark.readStream.schema(base.schema)
            .parquet(dup_dir)
            .select("event_id", "user_id", "event_type", "ts", "value")
        )
        deduped = stream_dedup(stream, ["event_id"], ts_col="ts", watermark="1 hour")
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName("dedup_out")
            .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.sql("SELECT * FROM dedup_out")
        assert out.count() == base.count()
        assert out.select("event_id").distinct().count() == base.count()

    def test_batch_twin_keeps_first_deterministically(self, spark):
        from dbt_icebreaker_spark.streaming.pipeline import dedup_keep_first

        ev = read_parquet(spark, f"{SF}/events.parquet")
        out = dedup_keep_first(
            ev, ["user_id", "event_type"], ts_col="ts", tiebreak="event_id"
        )
        # one row per key, and it is the min-(ts, event_id) row
        keys = ev.select("user_id", "event_type").distinct().count()
        assert out.count() == keys
        first = (
            ev.groupBy("user_id", "event_type")
            .agg(F.min(F.struct("ts", "event_id")).alias("m"))
            .select("user_id", "event_type", F.col("m.event_id").alias("event_id"))
        )
        got = out.join(first, ["user_id", "event_type", "event_id"]).count()
        assert got == keys


class TestClickAttribution:
    def test_batch_interval_join(self, spark):
        from dbt_icebreaker_spark.streaming.pipeline import attribute_clicks

        ev = read_parquet(spark, f"{SF}/events.parquet")
        out = attribute_clicks(
            ev.filter("event_type = 'view'"),
            ev.filter("event_type = 'click'"),
            horizon_minutes=30,
        )
        rows = out.collect()
        assert len(rows) > 0
        for r in rows:
            assert 0 <= r.delay_sec <= 30 * 60
            assert r.click_ts >= r.view_ts

    def test_stream_stream_matches_batch(self, spark, tmp_path):
        """The SAME operator over two file streams must produce the
        batch join's rows once both watermarks pass (availableNow
        drains everything, so the inner-join output is complete)."""
        from dbt_icebreaker_spark.streaming.pipeline import attribute_clicks

        base = read_parquet(spark, f"{SF}/events.parquet")
        vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
        base.filter("event_type = 'view'").write.parquet(vdir)
        base.filter("event_type = 'click'").write.parquet(cdir)

        views = spark.readStream.schema(base.schema).parquet(vdir)
        clicks = spark.readStream.schema(base.schema).parquet(cdir)
        joined = attribute_clicks(views, clicks, horizon_minutes=30)
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName("attrib_out")
            .option("checkpointLocation", str(tmp_path / "ckpt_attrib"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.view_id, r.click_id)
            for r in spark.sql("SELECT * FROM attrib_out").collect()
        }
        want = {
            (r.view_id, r.click_id)
            for r in attribute_clicks(
                base.filter("event_type = 'view'"),
                base.filter("event_type = 'click'"),
                horizon_minutes=30,
            ).collect()
        }
        assert got == want


class TestStreamIncrementalMerge:
    def test_streaming_upsert_converges(self, spark, tmp_path):
        """Streamed micro-batches merged by key == batch-distinct keys;
        re-running over overlapping data adds nothing new."""
        from dbt_icebreaker_spark.streaming.pipeline import stream_incremental_merge

        base = read_parquet(spark, f"{SF}/events.parquet").select(
            "event_id", "user_id", "event_type", "value"
        )
        src = str(tmp_path / "merge_src")
        base.write.parquet(src)

        target = "stream_test.events_upsert"
        spark.sql("CREATE DATABASE IF NOT EXISTS stream_test")
        spark.sql(f"DROP TABLE IF EXISTS {target}")
        stream_incremental_merge(
            spark, src, target, str(tmp_path / "ckpt_m1"), unique_key="event_id"
        )
        n_keys = base.select("event_id").distinct().count()
        assert spark.table(target).count() == n_keys

        # second pass: same data re-sent with one row patched ->
        # still one row per key, updated value wins (one batch row
        # per key: the engine's merge keeps ALL batch rows by design)
        upd = spark.createDataFrame(
            [(0, 999, "patched", 123.0)],
            "event_id long, user_id long, event_type string, value double",
        )
        base.filter("event_id <> 0").unionByName(upd).write.mode(
            "overwrite"
        ).parquet(src)
        stream_incremental_merge(
            spark, src, target, str(tmp_path / "ckpt_m2"), unique_key="event_id"
        )
        assert spark.table(target).count() == n_keys
        got = spark.table(target).filter("event_id = 0").collect()[0]
        assert got.event_type == "patched"


class TestStreamEnrich:
    """Stream–static dimension enrichment (enrich_stream): the
    streaming rendering must equal the batch twin, the dimension must
    broadcast (fact side unshuffled), and a dimension snapshot swapped
    underneath is picked up on the next trigger without a restart."""

    def test_stream_matches_batch_twin(self, spark, tmp_path):
        from dbt_icebreaker_spark.streaming.pipeline import enrich_stream

        ev = read_parquet(spark, f"{SF}/events.parquet")
        dim = read_parquet(spark, f"{SF}/customer.parquet").select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
        src = str(tmp_path / "ev_src")
        ev.write.parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        out = enrich_stream(stream, dim, "user_id")
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("enrich_out")
            .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "SELECT user_id, c_mktsegment, COUNT(*) AS n FROM enrich_out "
            "GROUP BY user_id, c_mktsegment"
        )
        want = (
            enrich_stream(ev, dim, "user_id")
            .groupBy("user_id", "c_mktsegment")
            .agg(F.count("*").alias("n"))
        )
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_dimension_broadcast_no_fact_shuffle(self, spark):
        from dbt_icebreaker_spark.streaming.pipeline import enrich_stream

        ev = read_parquet(spark, f"{SF}/events.parquet")
        dim = read_parquet(spark, f"{SF}/customer.parquet").select(
            F.col("c_custkey").alias("user_id"), "c_acctbal"
        )
        plan = enrich_stream(ev, dim, "user_id")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_refreshed_dimension_next_trigger(self, spark, tmp_path):
        """Swap the dimension parquet between two availableNow runs of
        the SAME checkpointed query — the second batch must see v2."""
        from dbt_icebreaker_spark.streaming.pipeline import enrich_stream

        dim_dir = str(tmp_path / "dim")
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        out_dir = str(tmp_path / "out")
        spark.createDataFrame([(1, "v1")], "user_id long, tag string") \
            .write.mode("overwrite").parquet(dim_dir)
        ev1 = spark.createDataFrame([(100, 1)], "event_id long, user_id long")
        ev1.write.parquet(src)

        def run_once():
            # file sink + shared checkpoint: each availableNow run
            # processes only NEW source files, against the dimension
            # snapshot read at (re)start
            dim = spark.read.parquet(dim_dir)
            stream = spark.readStream.schema(ev1.schema).parquet(src)
            q = (
                enrich_stream(stream, dim, "user_id")
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()
        rows = {(r.event_id, r.tag) for r in spark.read.parquet(out_dir).collect()}
        assert rows == {(100, "v1")}
        # v2 snapshot + a new fact file → only the new event flows, and
        # it joins against the refreshed dimension
        spark.createDataFrame([(1, "v2")], "user_id long, tag string") \
            .write.mode("overwrite").parquet(dim_dir)
        spark.createDataFrame([(200, 1)], "event_id long, user_id long") \
            .write.mode("append").parquet(src)
        run_once()
        rows = {(r.event_id, r.tag) for r in spark.read.parquet(out_dir).collect()}
        assert rows == {(100, "v1"), (200, "v2")}


class TestComposedStreamingPipeline:
    """End-to-end streaming ingestion showcase: file stream → dedup
    within watermark → static dimension enrichment → windowed counts,
    all composed in ONE streaming query, checked against the same
    operators composed in batch."""

    def test_dedup_enrich_window_chain(self, spark, tmp_path):
        from dbt_icebreaker_spark.streaming.pipeline import (
            dedup_keep_first, enrich_stream, stream_dedup, windowed_counts,
        )

        ev = read_parquet(spark, f"{SF}/events.parquet")
        dim = read_parquet(spark, f"{SF}/customer.parquet").select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
        # duplicated source = at-least-once delivery
        src = str(tmp_path / "dup_src")
        ev.write.parquet(src)
        ev.write.mode("append").parquet(src)

        stream = spark.readStream.schema(ev.schema).parquet(src)
        piped = windowed_counts(
            enrich_stream(
                stream_dedup(stream, ["event_id"], ts_col="ts",
                             watermark="1 hour"),
                dim, "user_id",
            ),
            ts_col="ts", window="10 minutes", key_col="c_mktsegment",
        )
        q = (
            piped.writeStream.outputMode("append")
            .format("memory")
            .queryName("composed_out")
            .option("checkpointLocation", str(tmp_path / "ckpt_comp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.sql(
            "SELECT window_start, c_mktsegment, n FROM composed_out"
        )
        # batch twin of the SAME composition; append mode withholds
        # windows the watermark hasn't finalized, so the stream's
        # output must be a subset that agrees exactly per emitted
        # (window, segment) — and must be non-trivial
        want = windowed_counts(
            enrich_stream(
                dedup_keep_first(ev, ["event_id"], ts_col="ts",
                                 tiebreak="event_id"),
                dim, "user_id",
            ),
            ts_col="ts", window="10 minutes", key_col="c_mktsegment",
        ).select("window_start", "c_mktsegment", "n")
        assert got.count() > 0
        assert got.exceptAll(want).count() == 0


class TestLoadProject:
    """dbt-style file loader (project.load_project): *.sql files with
    {{ config(...) }} + {{ ref('name') }} → ModelDefs with dependency
    edges, run end-to-end through ProjectRunner."""

    def _write_models(self, d):
        # table, not view: a persistent view cannot reference the
        # temp views register_dir creates (Spark INVALID_TEMP_OBJ_REFERENCE)
        (d / "stg_orders.sql").write_text(
            "{{ config(materialized='table') }}\n"
            "SELECT o_orderkey, o_custkey, o_totalprice FROM orders\n"
        )
        (d / "daily_rev.sql").write_text(
            "{{ config(materialized='incremental', unique_key='o_custkey',\n"
            "          incremental_strategy='merge') }}\n"
            "SELECT o_custkey, SUM(o_totalprice) AS rev\n"
            "FROM {{ ref('stg_orders') }} GROUP BY o_custkey\n"
        )

    def test_load_and_run(self, spark, tmp_path):
        from dbt_icebreaker_spark import IcebreakerEngine
        from dbt_icebreaker_spark.project import ProjectRunner, load_project
        from dbt_icebreaker_spark.sources import register_dir

        d = tmp_path / "models"
        d.mkdir()
        self._write_models(d)
        register_dir(spark, SF)
        models = load_project(str(d), schema="proj_demo")
        by = {m.name: m for m in models}
        assert by["stg_orders"].materialization == "table"
        assert by["daily_rev"].depends_on == ["stg_orders"]
        assert "proj_demo.stg_orders" in by["daily_rev"].sql
        eng = IcebreakerEngine(spark, schema="proj_demo")
        session = ProjectRunner(eng, state_dir=str(tmp_path / "state")).run(models)
        assert session["failed"] == []
        assert spark.table("proj_demo.daily_rev").count() > 0

    def test_unknown_ref_actionable(self, tmp_path):
        import pytest as _pytest

        from dbt_icebreaker_spark.project import load_project

        d = tmp_path / "m2"
        d.mkdir()
        (d / "a.sql").write_text("SELECT * FROM {{ ref('missing') }}")
        with _pytest.raises(ValueError, match="missing"):
            load_project(str(d))

    def test_leftover_jinja_actionable(self, tmp_path):
        import pytest as _pytest

        from dbt_icebreaker_spark.project import load_project

        d = tmp_path / "m3"
        d.mkdir()
        (d / "a.sql").write_text("SELECT {{ var('x') }} AS v FROM t")
        with _pytest.raises(ValueError, match="jinja"):
            load_project(str(d))

    def test_unknown_config_key_actionable(self, tmp_path):
        import pytest as _pytest

        from dbt_icebreaker_spark.project import load_project

        d = tmp_path / "m4"
        d.mkdir()
        (d / "a.sql").write_text(
            "{{ config(materialized='table', severity='warn') }}\nSELECT 1 AS one"
        )
        with _pytest.raises(ValueError, match="severity"):
            load_project(str(d))


class TestLoadProjectReviewFixes:
    def test_nested_model_dirs_load(self, tmp_path):
        from dbt_icebreaker_spark.project import load_project

        d = tmp_path / "m5"
        (d / "staging").mkdir(parents=True)
        (d / "marts").mkdir()
        (d / "staging" / "stg_a.sql").write_text("SELECT 1 AS one")
        (d / "marts" / "mart_b.sql").write_text(
            "SELECT * FROM {{ ref('stg_a') }}"
        )
        models = load_project(str(d), schema="s")
        by = {m.name: m for m in models}
        assert set(by) == {"stg_a", "mart_b"}
        assert by["mart_b"].depends_on == ["stg_a"]

    def test_block_tags_refuse_at_load(self, tmp_path):
        import pytest as _pytest

        from dbt_icebreaker_spark.project import load_project

        d = tmp_path / "m6"
        d.mkdir()
        (d / "a.sql").write_text(
            "SELECT * FROM t {% if is_incremental() %} WHERE x > 1 {% endif %}"
        )
        with _pytest.raises(ValueError, match="jinja"):
            load_project(str(d))

    def test_positional_config_refuses(self, tmp_path):
        import pytest as _pytest

        from dbt_icebreaker_spark.project import load_project

        d = tmp_path / "m7"
        d.mkdir()
        (d / "a.sql").write_text("{{ config('incremental') }}\nSELECT 1 AS one")
        with _pytest.raises(ValueError, match="keyword"):
            load_project(str(d))

    def test_non_literal_config_named(self, tmp_path):
        import pytest as _pytest

        from dbt_icebreaker_spark.project import load_project

        d = tmp_path / "m8"
        d.mkdir()
        (d / "mymodel.sql").write_text(
            "{{ config(materialized=env_var('M')) }}\nSELECT 1 AS one"
        )
        with _pytest.raises(ValueError, match="mymodel"):
            load_project(str(d))


class TestR7cStreamingEdges:
    """Round-7c streaming sweep lock-ins (scripts/probe_sweep_r7c.py,
    9 executed edges, all green — semantics pinned so they can't
    drift): NULL-key dedup parity, exact session-gap boundaries,
    inclusive attribution horizon, append-mode subset contract."""

    def test_null_keys_dedup_batch_twin(self, spark):
        from dbt_icebreaker_spark.streaming.pipeline import (
            dedup_keep_first,
        )

        df = spark.createDataFrame(
            [(None, "2026-01-01 10:00:00"), (None, "2026-01-01 10:00:01"),
             (7, "2026-01-01 10:00:02")], "k long, ts string"
        ).selectExpr("k", "CAST(ts AS TIMESTAMP) ts")
        # NULL keys group TOGETHER (one survivor) — matches
        # dropDuplicatesWithinWatermark's NULL handling
        assert dedup_keep_first(df, ["k"], ts_col="ts").count() == 2

    def test_session_gap_boundary_exact(self, spark):
        from dbt_icebreaker_spark.streaming.pipeline import (
            sessionize_batch,
            sessionize_native,
        )

        df = spark.createDataFrame(
            [(1, "2026-01-01 10:00:00", 1.0),
             (1, "2026-01-01 10:30:00", 1.0),    # exactly gap later
             (1, "2026-01-01 11:00:01", 1.0)],   # gap+1s -> new session
            "user_id long, ts string, value double",
        ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) ts", "value")
        b = sessionize_batch(df, gap_seconds=1800)
        n = sessionize_native(df, gap_seconds=1800)
        # an event exactly gap seconds after the last one CONTINUES
        # the session; one second past it opens a new one — and the
        # batch and native renderings agree
        assert b.count() == 2 and n.count() == 2

    def test_attribution_horizon_inclusive(self, spark):
        from dbt_icebreaker_spark.streaming.pipeline import (
            attribute_clicks,
        )

        imp = spark.createDataFrame(
            [(10, 1, "2026-01-01 10:00:00")],
            "event_id long, user_id long, ts string",
        ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) ts")
        clk = spark.createDataFrame(
            [(11, 1, "2026-01-01 10:30:00"),    # exactly +horizon
             (12, 1, "2026-01-01 10:30:01")],   # one second past
            "event_id long, user_id long, ts string",
        ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) ts")
        out = attribute_clicks(imp, clk, user_col="user_id",
                               ts_col="ts", id_col="event_id",
                               horizon_minutes=30).collect()
        assert [r.click_id for r in out] == [11]

    def test_empty_inputs(self, spark):
        from dbt_icebreaker_spark.streaming.pipeline import (
            dedup_keep_first,
            sessionize_batch,
        )

        df = spark.createDataFrame(
            [], "user_id long, ts timestamp, value double")
        assert sessionize_batch(df, 1800).count() == 0
        assert dedup_keep_first(df, ["user_id"], "ts").count() == 0


class TestStreamPatternDetectR10:
    """Round-10: streaming CEP — the batch MATCH_RECOGNIZE automaton
    inside applyInPandasWithState with event-time maturity semantics.
    Predicates: UP = strictly ascending vs the previous row."""

    DEFINES = {"UP": lambda v, prev: prev is not None and v is not None
               and v > prev}

    def test_batch_twin_runs(self, spark):
        import pandas as pd

        from dbt_icebreaker_spark.streaming.cep import (
            pattern_detect_batch,
        )

        base = pd.Timestamp("2026-01-01")
        rows = [(1, (base + pd.Timedelta(minutes=i)).to_pydatetime(), v)
                for i, v in enumerate([10.0, 11.0, 12.0, 5.0, 6.0])]
        rows += [(2, (base + pd.Timedelta(minutes=i)).to_pydatetime(), v)
                 for i, v in enumerate([3.0, 2.0, 1.0])]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double")
        out = pattern_detect_batch(df, "A UP+", self.DEFINES).collect()
        got = sorted((r.user_id, r.n_rows, r.first_value, r.last_value)
                     for r in out)
        # user 1: run 10->12 (3 rows) then 5->6 (2 rows); user 2: none
        assert got == [(1, 2, 5.0, 6.0), (1, 3, 10.0, 12.0)]

    def test_first_term_idxs(self):
        from dbt_icebreaker_spark.streaming.cep import _compile_pattern

        terms, _, first = _compile_pattern("A? B+ | C D")
        # A (optional) and B can both start alt 1; C starts alt 2
        syms = {terms[i].symbol for i in first}
        assert syms == {"A", "B", "C"}

    def test_streaming_subset_of_batch(self, spark, tmp_path):
        import pandas as pd

        from dbt_icebreaker_spark.streaming.cep import (
            pattern_detect_batch,
            stream_pattern_detect,
        )

        base = pd.Timestamp("2026-01-01")
        rows = []
        for u in range(4):
            vals = [10.0, 11.0, 12.0, 5.0, 6.0, 7.0, 1.0, 2.0]
            rows += [(u, (base + pd.Timedelta(minutes=i)
                          ).to_pydatetime(), v)
                     for i, v in enumerate(vals)]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double")
        src = str(tmp_path / "cep_src")
        # three files -> three micro-batches, so the watermark
        # advances past the first run's decision point mid-stream
        df.filter("ts < '2026-01-01 00:03:00'").coalesce(1) \
            .write.mode("overwrite").parquet(src)
        df.filter("ts >= '2026-01-01 00:03:00' AND "
                  "ts < '2026-01-01 00:06:00'").coalesce(1) \
            .write.mode("append").parquet(src)
        df.filter("ts >= '2026-01-01 00:06:00'").coalesce(1) \
            .write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(df.schema).option(
                "maxFilesPerTrigger", 1).parquet(src)
            .withWatermark("ts", "1 minute")
        )
        out_stream = stream_pattern_detect(
            stream, "A UP+", self.DEFINES)
        q = (out_stream.writeStream.outputMode("append")
             .format("memory").queryName("cep_out")
             .option("checkpointLocation", str(tmp_path / "cep_ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = {(r.user_id, r.n_rows, r.first_value, r.last_value)
               for r in spark.sql("SELECT * FROM cep_out").collect()}
        batch = {(r.user_id, r.n_rows, r.first_value, r.last_value)
                 for r in pattern_detect_batch(
                     df, "A UP+", self.DEFINES).collect()}
        # every streamed match is a batch match; the first run (10-12,
        # fully mature once the second file's watermark passes) emits
        assert got <= batch
        assert any(n == 3 for (_u, n, _f, _l) in got), got

    def test_timeout_flushes_tail_matches(self, spark, tmp_path):
        import pandas as pd

        from dbt_icebreaker_spark.streaming.cep import (
            stream_pattern_detect,
        )

        base = pd.Timestamp("2026-01-01")
        rows = [(9, (base + pd.Timedelta(minutes=i)).to_pydatetime(), v)
                for i, v in enumerate([1.0, 2.0, 3.0])]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double")
        src = str(tmp_path / "cep_flush_src")
        df.coalesce(1).write.mode("overwrite").parquet(src)
        ck = str(tmp_path / "cep_flush_ck")
        sink = str(tmp_path / "cep_flush_out")

        def run_once():
            # file sink (memory cannot recover from a checkpoint)
            stream = (spark.readStream.schema(df.schema)
                      .parquet(src).withWatermark("ts", "1 minute"))
            q = (stream_pattern_detect(stream, "A UP+", self.DEFINES)
                 .writeStream.outputMode("append").format("parquet")
                 .option("path", sink)
                 .option("checkpointLocation", ck)
                 .trigger(availableNow=True).start())
            q.awaitTermination(180)

        run_once()
        assert spark.read.parquet(sink).count() == 0
        # a much later row on another key advances the watermark past
        # the buffered tail -> the event-time timeout flushes it
        spark.createDataFrame(
            [(99, (base + pd.Timedelta(hours=2)).to_pydatetime(), 0.0)],
            df.schema).coalesce(1).write.mode("append").parquet(src)
        run_once()
        out = [(r.user_id, r.n_rows) for r in
               spark.read.parquet(sink).collect()]
        assert (9, 3) in out


class TestCepStuckHeadR11:
    """Round-11 (judge-advised, high): a match attempt that fails
    strictly INSIDE the mature prefix is final — the VM boundary flag
    distinguishes it from an attempt some future row could cure. A
    non-matching head row must not block the key's later matches."""

    DEFINES = {"UP": lambda v, prev: prev is not None and v is not None
               and v > prev}

    def _flags(self, pattern, vals):
        from dbt_icebreaker_spark.streaming.cep import _compile_pattern

        terms, progs, _ = _compile_pattern(pattern)
        symbols = [t.symbol for t in terms]
        flags = []
        for sym in symbols:
            pred = self.DEFINES.get(sym)
            if pred is None:
                flags.append([True] * len(vals))
                continue
            flags.append([
                bool(pred(v, vals[i - 1] if i > 0 else None))
                for i, v in enumerate(vals)
            ])
        return terms, progs, flags

    def test_head_failure_is_final_scan_advances(self):
        """Pattern 'A UP+' (A undefined): row0 cannot match (row1 is
        mature and not UP — final), so the scan must advance to the
        run at row1 instead of holding position 0 forever."""
        from dbt_icebreaker_spark.streaming.cep import _run_matches

        vals = [5.0, 3.0, 4.0, 5.0, 2.0]
        terms, progs, flags = self._flags("A UP+", vals)
        # mature boundary upto=4: pos0 fails finally (row1 not UP),
        # pos1's match would end AT the boundary -> undecided there
        matches, consumed, undecided = _run_matches(
            flags, terms, progs, len(vals), 4)
        assert matches == []
        assert consumed == 1          # advanced past the dead head
        assert undecided is True
        # all five rows mature: the (1,4) match is now final
        matches, consumed, undecided = _run_matches(
            flags, terms, progs, len(vals), 5)
        assert [(a, b) for a, b, _ in matches] == [(1, 4)]

    def test_boundary_touch_still_holds(self):
        """An attempt whose greedy path runs out of mature rows is
        genuinely undecided and must still hold."""
        from dbt_icebreaker_spark.streaming.cep import _run_matches

        vals = [1.0, 2.0, 3.0]
        terms, progs, flags = self._flags("A UP+", vals)
        matches, consumed, undecided = _run_matches(
            flags, terms, progs, 3, 3)
        assert matches == [] and consumed == 0 and undecided is True
        # flush: boundary is final
        matches, _, undecided = _run_matches(
            flags, terms, progs, 3, 3, flush=True)
        assert [(a, b) for a, b, _ in matches] == [(0, 3)]
        assert undecided is False

    def test_preferred_path_at_boundary_holds_match(self):
        """'A UP UP | A UP' over a mature [1,2] with boundary at 2:
        the 2-row alternative matches, but the PREFERRED 3-row one
        died at the boundary — emitting now would break preferment if
        an UP row arrives later, so the scan holds."""
        from dbt_icebreaker_spark.streaming.cep import _run_matches

        vals = [1.0, 2.0]
        terms, progs, flags = self._flags("A UP UP | A UP", vals)
        matches, consumed, undecided = _run_matches(
            flags, terms, progs, 2, 2)
        assert matches == [] and consumed == 0 and undecided is True

    def test_streaming_emits_after_dead_head(self, spark, tmp_path):
        """End-to-end: head row that can never match, then a complete
        run — the run's match must reach the sink."""
        import pandas as pd

        from dbt_icebreaker_spark.streaming.cep import (
            pattern_detect_batch,
            stream_pattern_detect,
        )

        base = pd.Timestamp("2026-01-01")
        vals = [9.0, 1.0, 2.0, 3.0, 0.5, 0.2]
        rows = [(7, (base + pd.Timedelta(minutes=i)).to_pydatetime(), v)
                for i, v in enumerate(vals)]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double")
        src = str(tmp_path / "cep_head_src")
        df.coalesce(1).write.mode("overwrite").parquet(src)
        ck = str(tmp_path / "ck")
        sink = str(tmp_path / "cep_head_out")

        def run_once():
            stream = (spark.readStream.schema(df.schema).parquet(src)
                      .withWatermark("ts", "1 minute"))
            q = (stream_pattern_detect(stream, "A UP+", self.DEFINES)
                 .writeStream.outputMode("append").format("parquet")
                 .option("path", sink)
                 .option("checkpointLocation", ck)
                 .trigger(availableNow=True).start())
            q.awaitTermination(180)

        run_once()
        # two more passes walk the watermark past the run's decision
        # point: the match must emit MID-STREAM (no timeout fires —
        # each new row re-arms the timeout past the watermark), which
        # is exactly what the stuck head used to block
        for mins in (10, 20):
            spark.createDataFrame(
                [(7, (base + pd.Timedelta(minutes=mins)
                      ).to_pydatetime(), 0.0)],
                df.schema).coalesce(1).write.mode("append").parquet(src)
            run_once()
        got = {(r.user_id, r.n_rows, r.first_value, r.last_value)
               for r in spark.read.parquet(sink).collect()}
        batch = {(r.user_id, r.n_rows, r.first_value, r.last_value)
                 for r in pattern_detect_batch(
                     df, "A UP+", self.DEFINES).collect()}
        assert (7, 3, 1.0, 3.0) in got
        assert got <= batch


class TestCepOverflowDegradeR11:
    """Round-11 (judge-advised): buffer-cap overflow degrades PER KEY
    (flush-and-reset + warning) instead of killing the whole query."""

    DEFINES = {"UP": lambda v, prev: prev is not None and v is not None
               and v > prev}

    def _ascending(self, spark, key, n):
        import pandas as pd

        base = pd.Timestamp("2026-01-01")
        rows = [(key, (base + pd.Timedelta(minutes=i)).to_pydatetime(),
                 float(i)) for i in range(n)]
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double")

    def test_flush_keeps_query_alive_and_emits(self, spark, tmp_path):
        from dbt_icebreaker_spark.streaming.cep import (
            stream_pattern_detect,
        )

        # 8 strictly-ascending rows: 'A UP+' greedily consumes to the
        # boundary every batch (genuinely undecided), so the buffer
        # grows past max_buffer=5 -> per-key flush
        df = self._ascending(spark, 3, 8)
        src = str(tmp_path / "cep_ovf_src")
        df.coalesce(1).write.mode("overwrite").parquet(src)
        stream = (spark.readStream.schema(df.schema).parquet(src)
                  .withWatermark("ts", "1 minute"))
        q = (stream_pattern_detect(stream, "A UP+", self.DEFINES,
                                   max_buffer=5)
             .writeStream.outputMode("append").format("memory")
             .queryName("cep_ovf_out")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(180)   # must NOT raise
        got = [(r.user_id, r.n_rows) for r in
               spark.sql("SELECT * FROM cep_ovf_out").collect()]
        # the flush emitted the full ascending run for the hot key
        assert (3, 8) in got

    def test_error_mode_fails_query(self, spark, tmp_path):
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )

        from dbt_icebreaker_spark.streaming.cep import (
            stream_pattern_detect,
        )

        df = self._ascending(spark, 4, 8)
        src = str(tmp_path / "cep_ovferr_src")
        df.coalesce(1).write.mode("overwrite").parquet(src)
        stream = (spark.readStream.schema(df.schema).parquet(src)
                  .withWatermark("ts", "1 minute"))
        q = (stream_pattern_detect(stream, "A UP+", self.DEFINES,
                                   max_buffer=5, on_overflow="error")
             .writeStream.outputMode("append").format("memory")
             .queryName("cep_ovferr_out")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        with pytest.raises(StreamingQueryException,
                           match="never completes"):
            q.awaitTermination(180)

    def test_bad_on_overflow_rejected(self, spark):
        from dbt_icebreaker_spark.streaming.cep import (
            stream_pattern_detect,
        )

        df = self._ascending(spark, 1, 2)
        with pytest.raises(ValueError, match="on_overflow"):
            stream_pattern_detect(
                df, "A UP+", self.DEFINES, on_overflow="nope")


class TestCepMeasuresR11:
    """Round-11 (judge task 4): arbitrary MEASURES in streaming CEP —
    compiled by the batch MATCH_RECOGNIZE SQL grammar, evaluated by
    the batch measure evaluator, so stream output equals the batch
    twin measure-for-measure."""

    DEFINES = {"UP": lambda v, prev: prev is not None and v is not None
               and v > prev}
    MEASURES = ("MAX(value) AS vmax, AVG(value) AS vavg, "
                "COUNT(*) AS n_rows, FIRST(value) AS v_first, "
                "CLASSIFIER() AS cls")

    def _df(self, spark):
        import pandas as pd

        base = pd.Timestamp("2026-01-01")
        rows = []
        for u in range(4):
            vals = [10.0, 11.0, 12.0, 5.0, 6.0, 7.0, 1.0, 2.0]
            rows += [(u, (base + pd.Timedelta(minutes=i)
                          ).to_pydatetime(), v)
                     for i, v in enumerate(vals)]
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double")

    def test_batch_twin_measures(self, spark):
        from dbt_icebreaker_spark.streaming.cep import (
            pattern_detect_batch,
        )

        out = pattern_detect_batch(
            self._df(spark), "A UP+", self.DEFINES,
            measures=self.MEASURES).collect()
        got = sorted((r.user_id, r.n_rows, r.vmax, r.v_first, r.cls,
                      round(r.vavg, 6)) for r in out if r.user_id == 0)
        assert got == [(0, 2, 2.0, 1.0, "UP", 1.5),
                       (0, 3, 7.0, 5.0, "UP", 6.0),
                       (0, 3, 12.0, 10.0, "UP", 11.0)]

    def test_stream_measures_subset_of_batch_across_restart(
            self, spark, tmp_path):
        from dbt_icebreaker_spark.streaming.cep import (
            pattern_detect_batch,
            stream_pattern_detect,
        )

        df = self._df(spark)
        src = str(tmp_path / "cepm_src")
        ck = str(tmp_path / "cepm_ck")
        sink = str(tmp_path / "cepm_out")
        df.filter("ts < '2026-01-01 00:04:00'").coalesce(1) \
            .write.mode("overwrite").parquet(src)

        def run_once():
            stream = (spark.readStream.schema(df.schema).parquet(src)
                      .withWatermark("ts", "1 minute"))
            q = (stream_pattern_detect(
                    stream, "A UP+", self.DEFINES,
                    measures=self.MEASURES)
                 .writeStream.outputMode("append").format("parquet")
                 .option("path", sink)
                 .option("checkpointLocation", ck)
                 .trigger(availableNow=True).start())
            q.awaitTermination(180)

        run_once()   # first half of the data
        # checkpoint RESTART with the rest of the data + a late tick
        # that pushes the watermark past everything
        df.filter("ts >= '2026-01-01 00:04:00'").coalesce(1) \
            .write.mode("append").parquet(src)
        run_once()
        import pandas as pd

        spark.createDataFrame(
            [(9, (pd.Timestamp("2026-01-01") + pd.Timedelta(hours=2)
                  ).to_pydatetime(), 0.0)],
            df.schema).coalesce(1).write.mode("append").parquet(src)
        run_once()
        got = {(r.user_id, r.n_rows, r.vmax, r.v_first, r.cls,
                round(r.vavg, 6))
               for r in spark.read.parquet(sink).collect()}
        batch = {(r.user_id, r.n_rows, r.vmax, r.v_first, r.cls,
                  round(r.vavg, 6))
                 for r in pattern_detect_batch(
                     df, "A UP+", self.DEFINES,
                     measures=self.MEASURES).collect()}
        assert got <= batch
        # all three runs per user flushed by the final watermark push
        assert len(got) == len(batch), (got, batch)

    def test_match_number_batch_twin(self, spark):
        # r13: MATCH_NUMBER graduated from refusal — the batch twin
        # numbers a key's matches 1..n in event-time order
        from dbt_icebreaker_spark.streaming.cep import (
            pattern_detect_batch,
        )

        out = pattern_detect_batch(
            self._df(spark), "A UP+", self.DEFINES,
            measures="MATCH_NUMBER() AS mn, COUNT(*) AS n").collect()
        got = sorted((r.mn, r.n) for r in out if r.user_id == 0)
        assert got == [(1, 3), (2, 3), (3, 2)]

    def test_match_number_stream_persists_across_batches(
            self, spark, tmp_path):
        # the per-key ordinal must survive micro-batch boundaries AND
        # a checkpoint restart (it lives in the group state): feed the
        # same key's three runs across three availableNow restarts and
        # expect 1, 2, 3 — a counter reset would repeat 1
        from dbt_icebreaker_spark.streaming.cep import (
            stream_pattern_detect,
        )
        import pandas as pd

        base = pd.Timestamp("2026-01-01")
        df = self._df(spark)
        src = str(tmp_path / "cepmn_src")
        ck = str(tmp_path / "cepmn_ck")
        sink = str(tmp_path / "cepmn_out")

        def run_once():
            stream = (spark.readStream.schema(df.schema).parquet(src)
                      .withWatermark("ts", "1 minute"))
            q = (stream_pattern_detect(
                    stream, "A UP+", self.DEFINES,
                    measures="MATCH_NUMBER() AS mn, COUNT(*) AS n")
                 .writeStream.outputMode("append").format("parquet")
                 .option("path", sink)
                 .option("checkpointLocation", ck)
                 .trigger(availableNow=True).start())
            q.awaitTermination(180)

        df.filter("ts < '2026-01-01 00:04:00'").coalesce(1) \
            .write.mode("overwrite").parquet(src)
        run_once()
        df.filter("ts >= '2026-01-01 00:04:00'").coalesce(1) \
            .write.mode("append").parquet(src)
        run_once()
        spark.createDataFrame(
            [(9, (base + pd.Timedelta(hours=2)).to_pydatetime(), 0.0)],
            df.schema).coalesce(1).write.mode("append").parquet(src)
        run_once()
        got = sorted((r.mn, r.n) for r in
                     spark.read.parquet(sink).collect()
                     if r.user_id == 0)
        assert got == [(1, 3), (2, 3), (3, 2)], got

    def test_symbol_scoped_measure(self, spark):
        from dbt_icebreaker_spark.streaming.cep import (
            pattern_detect_batch,
        )

        out = pattern_detect_batch(
            self._df(spark), "A UP+", self.DEFINES,
            measures="COUNT(UP.*) AS n_up, FIRST(UP.value) AS up0"
        ).collect()
        got = sorted((r.user_id, r.n_up, r.up0)
                     for r in out if r.user_id == 1)
        # per match: UP rows exclude the head A row
        assert got == [(1, 1, 2.0), (1, 2, 6.0), (1, 2, 11.0)]


class TestR12CepMeasureValidation:
    """Round-12 advisor: the CEP event shape exposes exactly (value,
    ts) — a measure over any other column must refuse at the front
    door with the supported-column list, not KeyError inside the
    stateful executor."""

    def test_unknown_column_refuses_sql(self):
        from dbt_icebreaker_spark.streaming.cep import (
            parse_measures_sql,
        )

        with pytest.raises(ValueError, match="'value' and 'ts'"):
            parse_measures_sql("MAX(amount) AS mx")

    def test_unknown_column_refuses_measure_list(self, spark):
        from dbt_icebreaker_spark.streaming.cep import (
            pattern_detect_batch,
        )
        from dbt_icebreaker_spark.xops.match_recognize import Measure

        df = spark.createDataFrame(
            [(1, None, 1.0)], "user_id long, ts timestamp, value double")
        with pytest.raises(ValueError, match="'value' and 'ts'"):
            pattern_detect_batch(
                df, "A", {"A": lambda v, p: True},
                measures=[Measure("mx", "max", None, "amount")])

    def test_supported_columns_pass(self):
        from dbt_icebreaker_spark.streaming.cep import (
            parse_measures_sql,
        )

        ms = parse_measures_sql(
            "MAX(value) AS mx, FIRST(ts) AS t0, COUNT(*) AS n")
        assert [m.name for m in ms] == ["mx", "t0", "n"]
