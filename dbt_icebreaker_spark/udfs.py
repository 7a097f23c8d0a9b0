"""Session-registered scalar UDFs for Snowflake functions with no
Spark rendering — currently the COMPRESS family (round 7, clearing the
r6 refused-scalar tail; ref: Snowflake COMPRESS/DECOMPRESS_*).

Arrow-vectorized ``pandas_udf``s (never row-at-a-time Python UDFs):
the codec work is per-batch over ``bytes`` cells, the only shape the
brief allows Python in. Registered once per SparkSession by
``IcebreakerEngine`` (idempotent, keyed on the session object).

Methods: ZLIB / GZIP / BZ2 / DEFLATE via the Python stdlib; SNAPPY /
ZSTD / BROTLI / LZO refuse with the actionable alternative (no codec
libs in the runtime). Snowflake's ``'method(level)'`` spelling is
accepted.

NOTE: this module must NOT use ``from __future__ import annotations``
— pandas_udf resolves the type hints at registration time.
"""

import bz2
import gzip
import re
import zlib

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, StringType



_METHOD_RE = re.compile(r"^\s*([A-Za-z0-9_]+)\s*(?:\((\d+)\))?\s*$")


def _parse_method(m) -> "tuple[str, int | None]":
    if m is None:
        return ("ZLIB", None)
    mm = _METHOD_RE.match(str(m))
    if not mm:
        raise ValueError(
            f"COMPRESS: bad method {m!r} — use 'zlib', 'gzip', 'bz2' "
            "or 'deflate', optionally with a level: 'zlib(6)'"
        )
    return (mm.group(1).upper(),
            int(mm.group(2)) if mm.group(2) else None)


def _codec(method: str):
    name, level = _parse_method(method)
    if name == "ZLIB":
        lv = 6 if level is None else level
        return (lambda b: zlib.compress(b, lv), zlib.decompress)
    if name == "DEFLATE":
        # raw deflate stream (no zlib header)
        lv = 6 if level is None else level
        return (
            lambda b: zlib.compress(b, lv)[2:-4],
            lambda b: zlib.decompress(b, -zlib.MAX_WBITS),
        )
    if name == "GZIP":
        lv = 9 if level is None else level
        # mtime=0: the gzip header must not embed wall-clock time —
        # COMPRESS must be deterministic across evaluations (joins /
        # GROUP BY on the result, task retries; r7 review)
        return (lambda b: gzip.compress(b, compresslevel=lv, mtime=0),
                gzip.decompress)
    if name == "BZ2":
        lv = 9 if level is None else level
        return (lambda b: bz2.compress(b, lv), bz2.decompress)
    raise ValueError(
        f"COMPRESS method {name!r} is not available in this runtime "
        "(no snappy/zstd/brotli codec libs) — use 'zlib', 'gzip', "
        "'bz2' or 'deflate', or store raw and let parquet's column "
        "codec compress transparently"
    )


def _to_bytes(v):
    if v is None:
        return None
    if isinstance(v, str):
        return v.encode("utf-8")
    return bytes(v)


def _apply_codec(data: pd.Series, method: pd.Series, idx: int) -> pd.Series:
    """Run one codec direction over a batch; the codec lookup is
    hoisted per UNIQUE method value (a Spark literal in practice —
    constant per batch), not re-parsed per cell (r7 review)."""
    codecs: dict = {}
    out = []
    for v, m in zip(data, method):
        b = _to_bytes(v)
        if b is None:
            out.append(None)
            continue
        fns = codecs.get(m)
        if fns is None:
            fns = codecs[m] = _codec(m)
        out.append(fns[idx](b))
    return pd.Series(out, dtype=object)


def _compress_series(data: pd.Series, method: pd.Series) -> pd.Series:
    return _apply_codec(data, method, 0)


def _decompress_series(data: pd.Series, method: pd.Series) -> pd.Series:
    return _apply_codec(data, method, 1)


def register_scalar_udfs(spark) -> None:
    """Idempotently register the COMPRESS-family UDFs on ``spark``.
    The marker is a session-attached attribute — an id()-keyed cache
    would wrongly skip a NEW session allocated at a recycled address
    (r7 review)."""
    if getattr(spark, "_icebreaker_udfs_registered", False):
        return

    @pandas_udf(BinaryType())
    def compress(data: pd.Series, method: pd.Series) -> pd.Series:
        return _compress_series(data, method)

    @pandas_udf(BinaryType())
    def decompress_binary(data: pd.Series, method: pd.Series) -> pd.Series:
        return _decompress_series(data, method)

    @pandas_udf(StringType())
    def decompress_string(data: pd.Series, method: pd.Series) -> pd.Series:
        return _decompress_series(data, method).map(
            lambda b: None if b is None else b.decode("utf-8"))

    spark.udf.register("compress", compress)
    spark.udf.register("decompress_binary", decompress_binary)
    spark.udf.register("decompress_string", decompress_string)
    # only mark AFTER all three registered — a failed first attempt
    # must not poison later engines on this session (r7 review)
    spark._icebreaker_udfs_registered = True
