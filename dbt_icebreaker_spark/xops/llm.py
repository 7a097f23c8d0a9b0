"""LLM model-call columns (SURVEY §2.6 X4).

CORTEX-shaped API — the reference recognizes
``SNOWFLAKE.CORTEX.COMPLETE/SENTIMENT/SUMMARIZE/TRANSLATE/
EXTRACT_ANSWER`` and defers them to the cloud
(`auto_router.py:80-84`); here they are first-class column operators:
Arrow-batched iterator pandas UDFs calling a pluggable endpoint, with
a content-hash Parquet result cache so re-runs over 100 TB only pay
for new rows.

No model endpoint exists in this container, so the default endpoint is
a deterministic stub; swap ``set_endpoint(fn)`` with a real client.
The iterator UDF form keeps one client per executor process rather
than per batch.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# endpoint: (task, payload_series) -> response_series
Endpoint = Callable[[str, pd.Series], pd.Series]

_endpoint: Optional[Endpoint] = None


def set_endpoint(fn: Endpoint) -> None:
    global _endpoint
    _endpoint = fn


def _stub_endpoint(task: str, payload: pd.Series) -> pd.Series:
    """Deterministic fake: hash-derived outputs so tests are stable."""
    def one(text: str) -> str:
        if text is None:
            return None
        h = hashlib.md5(f"{task}:{text}".encode()).hexdigest()
        if task == "sentiment":
            # [-1, 1] from the hash, 2 decimals
            return str(round((int(h[:8], 16) / 0xFFFFFFFF) * 2 - 1, 2))
        if task == "summarize":
            return " ".join(text.split()[:10])
        if task == "translate":
            return text[::-1]
        if task == "extract_json":
            # payload = "{schema}\x00{text}" (or the REPAIR form);
            # answer with a deterministic valid object per schema
            import json as _json

            parts = text.split("\x00")
            schema_part = parts[1] if parts[0] == "REPAIR" else parts[0]
            try:
                fields = _json.loads(schema_part)
            except _json.JSONDecodeError:
                return "{}"
            out = {}
            for k, typ in sorted(fields.items()):
                hv = int(hashlib.md5(f"{k}:{text}".encode()).hexdigest()[:8], 16)
                t = typ.lower()
                if "int" in t or "long" in t:
                    out[k] = hv % 1000
                elif "double" in t or "float" in t:
                    out[k] = round(hv % 1000 / 10.0, 1)
                elif "bool" in t:
                    out[k] = bool(hv % 2)
                else:
                    out[k] = f"v{hv % 10000}"
            return _json.dumps(out, sort_keys=True)
        return f"[{task}:{h[:12]}]"
    return payload.map(one)


def _make_udf(task: str):
    # Capture the endpoint at UDF-definition time: pandas UDFs run in
    # separate Python worker processes where this module is re-imported
    # fresh (module-global _endpoint would silently revert to the
    # stub). cloudpickle ships the captured callable to the workers —
    # so a real endpoint must be picklable.
    fn = _endpoint or _stub_endpoint

    @pandas_udf("string")
    def run(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # iterator form: endpoint/client initialized once per worker
        for s in batches:
            yield fn(task, s)

    return run


def complete(col) -> "F.Column":
    return _make_udf("complete")(col)


def sentiment(col) -> "F.Column":
    return _make_udf("sentiment")(col)


def summarize(col) -> "F.Column":
    return _make_udf("summarize")(col)


def translate(col) -> "F.Column":
    return _make_udf("translate")(col)


def extract_answer(question_and_doc) -> "F.Column":
    return _make_udf("extract_answer")(question_and_doc)


def cached_apply(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    text_col: str,
    task: str,
    cache_path: str,
) -> DataFrame:
    """Content-hash cached model calls (the reference's source-cache
    idea applied to model outputs): rows whose md5(text) already
    appears in the Parquet cache skip the endpoint; only misses call
    the model, then the cache is appended. At 100 TB this is the
    difference between re-paying the whole corpus per run and paying
    the delta.

    The endpoint is paid exactly once per distinct missing text: miss
    results are materialized INTO the cache first, then all rows read
    their result back from the refreshed cache — returning the lazy
    `computed` plan directly would re-invoke the endpoint when the
    caller consumes the DataFrame (twice per miss, and a
    non-deterministic endpoint could return values that differ from
    what was cached). Cache membership is decided by a join match
    indicator, not result NULL-ness, so a legitimately-NULL cached
    result is still a hit."""
    # sentinel for NULL text: md5(NULL) is NULL and NULL join keys
    # never match, so NULL-text rows would re-miss every run
    hashed = df.withColumn(
        "__h", F.md5(F.coalesce(F.col(text_col), F.lit("\x00__null__")))
    )
    try:
        cache = spark.read.parquet(cache_path).select("__h", "__result")
    except Exception:
        cache = None
    if cache is not None:
        marker = cache.select("__h").withColumn("__cached", F.lit(True))
        misses = (
            hashed.join(F.broadcast(marker), "__h", "left")
            .filter(F.col("__cached").isNull())
            .drop("__cached")
        )
    else:
        misses = hashed
    miss_payloads = misses.select("__h", text_col).distinct()
    computed = miss_payloads.select(
        "__h", _make_udf(task)(F.col(text_col)).alias("__result")
    )
    computed.write.mode("append").parquet(cache_path)
    # one result per hash even if appends ever duplicate (max ties
    # deterministically; NULL results survive as NULL)
    full_cache = (
        spark.read.parquet(cache_path)
        .groupBy("__h")
        .agg(F.max("__result").alias("__result"))
    )
    result = hashed.join(full_cache, "__h", "left")
    return result.drop("__h").withColumnRenamed("__result", f"{task}_result")


# ------------------------------------------------------- structured output
def extract_structured(
    df: DataFrame,
    text_col: str,
    fields: dict[str, str],
    max_retries: int = 1,
    task: str = "extract_json",
) -> DataFrame:
    """Schema-constrained extraction with validation + repair-retry —
    the plumbing a production extraction pipeline needs around any
    model endpoint:

    1. the endpoint receives a payload of ``{schema}\\x00{text}`` and
       must return a JSON object with the requested ``fields``
       (name → Spark type string);
    2. outputs are validated JVM-side: JSON-parseable object AND the
       typed from_json struct materializes (a missing/mistyped field
       nulls the struct field, a non-object nulls the struct);
    3. invalid rows are re-sent up to ``max_retries`` times with a
       repair payload embedding the previous bad output;
    4. still-invalid rows land with ``extract_ok = false`` and a NULL
       struct — quarantine, never a crash (the X4 contract).

    The retry loop is driver-side composition of bounded depth — each
    pass is one lazy transform, so Catalyst sees max_retries+1
    branches, not an unbounded iteration. The stub endpoint answers
    deterministically; tests exercise the repair path by installing a
    first-call-garbled endpoint via set_endpoint."""
    import json as _json

    schema_json = _json.dumps(fields, sort_keys=True)
    struct_ddl = ", ".join(f"`{k}` {v}" for k, v in sorted(fields.items()))

    def payload(col, prev=None):
        base = F.concat(F.lit(schema_json + "\x00"), F.coalesce(col, F.lit("")))
        if prev is None:
            return base
        return F.concat(
            F.lit("REPAIR\x00" + schema_json + "\x00"),
            F.coalesce(col, F.lit("")),
            F.lit("\x00PREVIOUS_INVALID\x00"),
            F.coalesce(prev, F.lit("")),
        )

    def attempt(frame, prev_col):
        out = _make_udf(task)(
            payload(F.col(text_col), None if prev_col is None else F.col(prev_col))
        )
        # from_json with a STRUCT schema is PERMISSIVE (all-null row,
        # never NULL) — the map-schema parse is the strict probe: NULL
        # for malformed JSON and for non-object values (scalars,
        # arrays), probed against a live session. On top of that,
        # every requested field must be PRESENT, and a present
        # non-null value must survive the typed cast (a mistyped
        # field nulls the struct field while the raw map value is
        # non-null → invalid → retry). An explicit JSON null is a
        # legal answer.
        frame = frame.withColumn("__out", out)
        m = F.from_json(F.col("__out"), "map<string,string>")
        s = F.from_json(F.col("__out"), struct_ddl)
        ok = m.isNotNull()
        for k2 in fields:
            ok = (
                ok
                & F.map_contains_key(m, k2)
                & (s[k2].isNotNull() | F.element_at(m, k2).isNull())
            )
        return frame.withColumn("__ok", ok)

    # each round's frame is persisted BEFORE the good/bad split: both
    # branches must read the SAME endpoint outputs. Without the cache,
    # filter(ok) and filter(~ok) re-invoke the endpoint independently —
    # a nondeterministic model could judge a row valid in one branch
    # and invalid in the other (duplicated or silently dropped rows),
    # and even a deterministic endpoint would be paid once per branch
    # per round. Caches are bounded: round 0 holds the full batch,
    # later rounds only the shrinking miss set.
    current = attempt(df, None).persist()
    for _ in range(max_retries):
        good = current.filter(F.col("__ok"))
        bad = current.filter(~F.col("__ok")).withColumnRenamed("__out", "__prev")
        retried = attempt(bad.drop("__ok"), "__prev").drop("__prev").persist()
        current = good.unionByName(retried)
    return current.select(
        *df.columns,
        F.col("__ok").alias("extract_ok"),
        F.when(F.col("__ok"), F.from_json(F.col("__out"), struct_ddl))
        .otherwise(F.lit(None))
        .alias("extracted"),
    )
