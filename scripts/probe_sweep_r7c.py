"""Round-7c probe sweep: streaming semantics edges executed through
the streaming module (watermark late-data, session gap boundaries,
NULL keys, empty batches). Run:

    python scripts/probe_sweep_r7c.py

Findings get fixed and locked into tests/test_project_streaming.py."""

import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

wh = "/tmp/r7c_sweep_wh"
shutil.rmtree(wh, ignore_errors=True)
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.warehouse.dir", wh)
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from dbt_icebreaker_spark.streaming import pipeline as sp  # noqa: E402

ok = fail = 0
failures = []


def check(name, got, expect):
    global ok, fail
    if got == expect:
        ok += 1
    else:
        fail += 1
        failures.append((name, f"got {got!r} expected {expect!r}"))


def run_stream(df_stream, name, tmp, mode="append"):
    q = (df_stream.writeStream.outputMode(mode).format("memory")
         .queryName(name)
         .option("checkpointLocation", f"{tmp}/ckpt_{name}")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


tmp = tempfile.mkdtemp(prefix="r7c_")

# fixture: 2 files arriving in order — file2 carries a LATE event
rows1 = [
    (1, "2026-01-01 10:00:00", 100, "view", 1.0),
    (2, "2026-01-01 10:05:00", 100, "view", 2.0),
    (3, "2026-01-01 12:00:00", 100, "view", 4.0),   # advances watermark
]
rows2 = [
    (4, "2026-01-01 10:01:00", 100, "view", 8.0),   # LATE (2h behind max)
    (5, "2026-01-01 12:10:00", 100, "view", 16.0),
]
schema = "event_id long, ts string, user_id long, event_type string, value double"
src = f"{tmp}/late_src"
spark.createDataFrame(rows1, schema).selectExpr(
    "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type", "value"
).coalesce(1).write.parquet(src)
spark.createDataFrame(rows2, schema).selectExpr(
    "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type", "value"
).coalesce(1).write.mode("append").parquet(src)
base_schema = spark.read.parquet(src).schema

def stream():
    return spark.readStream.schema(base_schema).option(
        "maxFilesPerTrigger", 1).parquet(src)

# 1. windowed counts: with a 30m watermark + availableNow the late
# event may or may not drop depending on file order within the batch;
# assert the TOTAL is conserved across windows for the batch twin
wc = sp.windowed_counts(stream(), ts_col="ts", key_col="user_id",
                        window="1 hour", watermark="30 minutes")
out = run_stream(wc, "r7c_wc", tmp)
total = out.agg(F.sum("n")).collect()[0][0] or 0
# append mode: only windows the watermark has passed EMIT, and the
# 2h-late event drops — streaming output is a strict subset of the
# batch rendering (which ignores the watermark and sees all 5)
batch_total = sp.windowed_counts(
    spark.read.parquet(src), ts_col="ts", key_col="user_id",
    window="1 hour", watermark="30 minutes"
).agg(F.sum("n")).collect()[0][0]
check("windowed-counts-batch-sees-all", batch_total, 5)
check("windowed-counts-stream-subset", 0 < total <= batch_total, True)

# 2. dedup NULL keys: dropDuplicatesWithinWatermark treats NULL==NULL
# (one survivor) — pin whichever semantic holds so it can't drift
d_rows = [(None, "2026-01-01 10:00:00"), (None, "2026-01-01 10:00:01"),
          (7, "2026-01-01 10:00:02")]
dsrc = f"{tmp}/nk_src"
spark.createDataFrame(d_rows, "k long, ts string").selectExpr(
    "k", "CAST(ts AS TIMESTAMP) ts").write.parquet(dsrc)
dd = sp.stream_dedup(
    spark.readStream.schema(spark.read.parquet(dsrc).schema).parquet(dsrc),
    ["k"], ts_col="ts", watermark="1 hour")
dout = run_stream(dd, "r7c_nk", tmp)
check("stream-dedup-null-keys", dout.count(), 2)  # NULLs dedup together

# 3. batch twin with NULL keys must agree
bt = sp.dedup_keep_first(
    spark.read.parquet(dsrc), ["k"], ts_col="ts")
check("batch-twin-null-keys", bt.count(), 2)

# 4. sessionize gap boundary: events exactly gap seconds apart —
# same session or split? pin batch twin behavior
s_rows = [(1, "2026-01-01 10:00:00", 1.0),
          (1, "2026-01-01 10:30:00", 1.0),   # exactly 1800s later
          (1, "2026-01-01 11:00:01", 1.0)]   # 1801s later -> new session
ssrc = f"{tmp}/sess_src"
spark.createDataFrame(s_rows, "user_id long, ts string, value double").selectExpr(
    "user_id", "CAST(ts AS TIMESTAMP) ts", "value").write.parquet(ssrc)
sb = sp.sessionize_batch(spark.read.parquet(ssrc), gap_seconds=1800)
check("sessionize-batch-gap-boundary", sb.count(), 2)
nat = sp.sessionize_native(spark.read.parquet(ssrc), gap_seconds=1800)
check("sessionize-native-agrees", nat.count(), sb.count())

# 5. empty source: batch twins over 0 rows
empty = spark.read.parquet(ssrc).where("user_id < 0")
check("sessionize-empty", sp.sessionize_batch(empty, 1800).count(), 0)
check("dedup-empty", sp.dedup_keep_first(empty, ["user_id"], "ts").count(), 0)

# 6. attribute_clicks bounds: click exactly AT the window edge
a_rows_imp = [(10, 1, "2026-01-01 10:00:00")]
a_rows_clk = [(11, 1, "2026-01-01 10:30:00"),   # exactly +30m
              (12, 1, "2026-01-01 10:30:01")]   # past the bound
isrc, csrc = f"{tmp}/imp", f"{tmp}/clk"
spark.createDataFrame(a_rows_imp, "event_id long, user_id long, ts string").selectExpr(
    "event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts").write.parquet(isrc)
spark.createDataFrame(a_rows_clk, "event_id long, user_id long, ts string").selectExpr(
    "event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts").write.parquet(csrc)
att = sp.attribute_clicks(
    spark.read.parquet(isrc), spark.read.parquet(csrc),
    user_col="user_id", ts_col="ts", id_col="event_id",
    horizon_minutes=30)
got = sorted(r.click_id for r in att.collect())
check("attribution-window-edge-inclusive", got, [11])

print(f"\n{ok} ok, {fail} FAIL")
for n, m in failures:
    print(f"  FAIL {n}: {m}")
