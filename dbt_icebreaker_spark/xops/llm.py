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
        return f"[{task}:{h[:12]}]"
    return payload.map(one)


def _call(task: str, payload: pd.Series) -> pd.Series:
    fn = _endpoint or _stub_endpoint
    return fn(task, payload)


def _make_udf(task: str):
    @pandas_udf("string")
    def run(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # iterator form: endpoint/client initialized once per worker
        for s in batches:
            yield _call(task, s)

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
    the delta."""
    hashed = df.withColumn("__h", F.md5(F.col(text_col)))
    try:
        cache = spark.read.parquet(cache_path).select("__h", "__result")
    except Exception:
        cache = None
    if cache is not None:
        hit = hashed.join(F.broadcast(cache), "__h", "left")
        misses = hit.filter(F.col("__result").isNull()).drop("__result")
    else:
        hit = None
        misses = hashed
    computed = misses.withColumn("__result", _make_udf(task)(F.col(text_col)))
    new_cache = computed.select("__h", "__result").distinct()
    new_cache.write.mode("append").parquet(cache_path)
    if hit is not None:
        hits_only = hit.filter(F.col("__result").isNotNull())
        result = hits_only.unionByName(computed)
    else:
        result = computed
    return result.drop("__h").withColumnRenamed("__result", f"{task}_result")
