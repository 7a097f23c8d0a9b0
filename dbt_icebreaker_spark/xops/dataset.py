"""Sharded dataset export with an integrity manifest.

The end product of a training-data pipeline is not a DataFrame — it
is a directory of balanced shards plus a manifest that lets a
downstream trainer (or a re-run) verify it got exactly the bytes the
pipeline produced. This applies the reference's sync-verification
idea (row-count verify per synced table, `sync_manager.py:76-164`,
`connections.py:422-536` in `/root/reference/`) at dataset
granularity, extended with order-independent content hashes.

Design for 100 TB:
- shard assignment is a deterministic hash of the id column — stable
  under repartitioning, appends and re-runs, balanced by the hash
  (no sort, no global ordering step);
- per-shard stats (rows, tokens, xor-folded content hash) come from
  ONE aggregation over the written data; only n_shards scalar rows
  ever reach the driver;
- the content hash folds xxhash64(id, text) with BIT_XOR — order
  independent, so verification does not care how Spark ordered rows
  within a shard file, and a single flipped row flips the hash;
- `verify_dataset` recomputes the same aggregate from the files on
  disk and compares — a missing file, duplicated row, or silent
  corruption surfaces as a per-shard mismatch, not a vague failure.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# underscore prefix: Spark/Hadoop readers skip _-prefixed files (the
# _SUCCESS convention), so the manifest can live inside the dataset
# directory without confusing spark.read.parquet(path)
MANIFEST_NAME = "_manifest.json"


def _shard_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-shard (rows, whitespace tokens, xor-folded content hash)."""
    return df.groupBy("shard").agg(
        F.count("*").alias("rows"),
        F.sum(F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")))
        .alias("tokens"),
        F.expr(f"bit_xor(xxhash64({id_col}, {text_col}))").alias("content_hash"),
    )


def write_sharded_dataset(
    df: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    n_shards: int = 16,
    extra_cols: Optional[list[str]] = None,
    fmt: str = "parquet",
) -> dict:
    """Write `df` as `n_shards` hash-balanced shards under `path`
    (partitioned by `shard=`), plus a `manifest.json` with per-shard
    row counts, token counts and content hashes. ``fmt="json"``
    writes JSON-Lines — the format most LLM training loaders stream —
    with identical sharding and the same recompute-and-diff
    verification (the manifest records the format).

    Returns the manifest dict. The shard column is
    pmod(xxhash64(id), n_shards): deterministic, so re-running the
    pipeline on identical input reproduces identical shard membership
    (the manifest hashes then prove it).
    """
    if fmt not in ("parquet", "json"):
        raise ValueError("fmt must be 'parquet' or 'json'")
    cols = [id_col, text_col] + list(extra_cols or [])
    sharded = df.select(*cols).withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    )
    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )
    # stats from what is actually ON DISK, not the input plan — a
    # write-path bug (lost partition, double write) must show up here
    spark = df.sparkSession
    written = spark.read.format(fmt).load(path)
    stats = {
        int(r.shard): {
            "rows": int(r.rows),
            "tokens": int(r.tokens),
            "content_hash": int(r.content_hash),
        }
        for r in _shard_stats(written, id_col, text_col).collect()
    }
    manifest = {
        "n_shards": n_shards,
        "format": fmt,
        "id_col": id_col,
        "text_col": text_col,
        "total_rows": sum(s["rows"] for s in stats.values()),
        "total_tokens": sum(s["tokens"] for s in stats.values()),
        "shards": {str(k): v for k, v in sorted(stats.items())},
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def verify_dataset(spark: SparkSession, path: str) -> dict:
    """Recompute per-shard stats from the files under `path` and diff
    them against `manifest.json`. Returns {"ok": bool, "mismatches":
    {shard: {field: (expected, actual)}}, "missing": [...],
    "unexpected": [...]}."""
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    # a verifier must see DISK truth: drop any cached file listing for
    # the path (a same-session write left sizes in the file-status
    # cache; post-write tampering would otherwise fail the read with a
    # length mismatch instead of being reported per shard)
    try:
        spark.catalog.refreshByPath(path)
    except Exception:
        pass
    actual_df = _shard_stats(
        spark.read.format(manifest.get("format", "parquet")).load(path),
        manifest["id_col"],
        manifest["text_col"],
    )
    actual = {
        str(int(r.shard)): {
            "rows": int(r.rows),
            "tokens": int(r.tokens),
            "content_hash": int(r.content_hash),
        }
        for r in actual_df.collect()
    }
    expected = manifest["shards"]
    mismatches: dict = {}
    for shard, exp in expected.items():
        act = actual.get(shard)
        if act is None:
            continue
        diff = {
            k: (exp[k], act[k]) for k in ("rows", "tokens", "content_hash")
            if exp[k] != act[k]
        }
        if diff:
            mismatches[shard] = diff
    missing = sorted(set(expected) - set(actual), key=int)
    unexpected = sorted(set(actual) - set(expected), key=int)
    return {
        "ok": not mismatches and not missing and not unexpected,
        "mismatches": mismatches,
        "missing": missing,
        "unexpected": unexpected,
    }
