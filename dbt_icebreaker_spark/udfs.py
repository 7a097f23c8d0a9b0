"""Session-registered scalar UDFs for Snowflake functions with no
Spark rendering — the COMPRESS family (round 7, clearing the
r6 refused-scalar tail; ref: Snowflake COMPRESS/DECOMPRESS_*) and the
APPROX_PERCENTILE_ACCUMULATE/COMBINE/ESTIMATE sketch pipeline (round
8 name-audit batch — the quantile twin of the HLL_ACCUMULATE family,
but Spark's Datasketches surface has no quantile-sketch aggregates, so
the state is engine-built: a deterministic equal-weight centroid
digest serialized as JSON text; engine-internal, like the HLL note).

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
from pyspark.sql.types import BinaryType, DoubleType, StringType



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


# ---------------------------------------------------------------- r8:
# APPROX_PERCENTILE sketch pipeline. State = up to _PCTL_K equal-weight
# centroids [(mean, weight), …] + exact min/max/count, JSON-serialized.
# Rank error is bounded by ~1/_PCTL_K (each centroid holds ≤ n/K of the
# mass), comfortably inside "approximate percentile" expectations.
# ACCUMULATE/COMBINE are series-to-scalar (grouped-agg) pandas UDFs —
# each GROUP's values materialize in one task, the same per-group
# contract Snowflake's state functions have; COMBINE's inputs are tiny
# (K centroids per partial, the 100 TB partial-aggregation pattern).
_PCTL_K = 512


def _pctl_compress(pairs: "list[tuple[float, float]]"):
    """Deterministic recompression of (mean, weight) pairs sorted by
    mean into ≤ _PCTL_K equal-weight chunks (weighted means)."""
    if len(pairs) <= _PCTL_K:
        return pairs
    total = sum(w for _, w in pairs)
    per = total / _PCTL_K
    out = []
    acc_w = 0.0
    acc_mw = 0.0
    budget = per
    for m, w in pairs:
        acc_w += w
        acc_mw += m * w
        if acc_w >= budget and len(out) < _PCTL_K - 1:
            out.append((acc_mw / acc_w, acc_w))
            budget = per  # next chunk target (relative)
            acc_w = 0.0
            acc_mw = 0.0
    if acc_w > 0:
        out.append((acc_mw / acc_w, acc_w))
    return out


def _pctl_state_from_values(values) -> str:
    import json

    vals = sorted(float(v) for v in values if v is not None
                  and v == v)  # drop NULL/NaN like every aggregate
    if not vals:
        return json.dumps({"n": 0})
    pairs = _pctl_compress([(v, 1.0) for v in vals])
    return json.dumps({
        "n": len(vals), "mn": vals[0], "mx": vals[-1],
        "c": [[round(m, 12), w] for m, w in pairs],
    })


def _pctl_merge_states(states) -> str:
    import json

    pairs: list = []
    n = 0
    mn = mx = None
    for s in states:
        if s is None:
            continue
        st = json.loads(s)
        if not st.get("n"):
            continue
        n += st["n"]
        mn = st["mn"] if mn is None else min(mn, st["mn"])
        mx = st["mx"] if mx is None else max(mx, st["mx"])
        pairs.extend((m, w) for m, w in st["c"])
    if n == 0:
        return json.dumps({"n": 0})
    pairs.sort()
    pairs = _pctl_compress(pairs)
    return json.dumps({
        "n": n, "mn": mn, "mx": mx,
        "c": [[round(m, 12), w] for m, w in pairs],
    })


def _pctl_estimate_one(state, p):
    import json

    if state is None or p is None:
        return None
    st = json.loads(state)
    if not st.get("n"):
        return None
    p = float(p)
    if p <= 0:
        return float(st["mn"])
    if p >= 1:
        return float(st["mx"])
    cents = st["c"]
    total = sum(w for _, w in cents)
    target = p * total
    # interpolate between centroid cumulative-weight MIDPOINTS, the
    # standard digest estimator; clamp with the exact extremes
    cum = 0.0
    prev_mid = 0.0
    prev_mean = float(st["mn"])
    for m, w in cents:
        mid = cum + w / 2.0
        if target <= mid:
            span = mid - prev_mid
            fr = 0.0 if span <= 0 else (target - prev_mid) / span
            return prev_mean + fr * (m - prev_mean)
        cum += w
        prev_mid = mid
        prev_mean = m
    return float(st["mx"])


# ---------------------------------------------------------------- r8:
# APPROX_TOP_K sketch pipeline (the frequent-items twin of the
# percentile digest above). State = a Misra-Gries-style counter map
# JSON-serialized {"c": {item: count}, "cap": n}. Deterministic:
# eviction decrements all counters by the threshold (classic
# space-saving), ties broken by item string order. The user's
# counters argument is honored up to Snowflake's own 100000 maximum
# (r8 review: a silent 1024 clamp degraded accuracy); NULL counters
# falls back to Snowflake's 10000 default. Counter keys canonicalize
# integral floats to int text ("1.0" → "1") so a NULL-induced float64
# partial and an int64 partial COMBINE onto the same key.
_TOPK_CAP = 100_000
_TOPK_DEFAULT = 10_000


def _topk_key(v) -> str:
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def _topk_trim(counts: dict, cap: int) -> dict:
    if len(counts) <= cap:
        return counts
    # space-saving decrement: drop the smallest counters, subtract the
    # threshold from the rest (deterministic tie-break on the key)
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    thresh = ordered[cap][1]
    trimmed = {k: v - thresh for k, v in ordered[:cap] if v > thresh}
    if not trimmed:
        # full tie at the cap boundary (e.g. 4 equally-frequent items,
        # cap 3): the plain decrement empties the sketch — a valid
        # Misra-Gries summary but useless, and Snowflake's
        # APPROX_TOP_K never returns empty for non-empty input (r9
        # sweep finding). Keep the top-cap keys at count 1 (the
        # deterministic tie-break picks which), i.e. decrement by
        # thresh-1 instead.
        trimmed = {k: 1 for k, _ in ordered[:cap]}
    return trimmed


def _topk_state_from_values(values, cap) -> str:
    import json

    counts: dict = {}
    for v in values:
        if v is None or v != v:  # drop NULL/NaN like every aggregate
            continue
        k = _topk_key(v)
        counts[k] = counts.get(k, 0) + 1
    return json.dumps({"c": _topk_trim(counts, cap), "cap": cap},
                      sort_keys=True)


def _topk_merge_states(states) -> str:
    import json

    counts: dict = {}
    cap = _TOPK_CAP
    for s in states:
        if s is None:
            continue
        st = json.loads(s)
        cap = min(cap, st.get("cap", _TOPK_CAP))
        for k, v in st["c"].items():
            counts[k] = counts.get(k, 0) + v
    return json.dumps({"c": _topk_trim(counts, cap), "cap": cap},
                      sort_keys=True)


def _topk_item_out(item: str):
    """Numeric-looking counter keys render as JSON numbers so the
    sketch pipeline's output shape matches the direct APPROX_TOP_K
    path ([[1,2]] not [["1",2]] — r8 review)."""
    try:
        return int(item)
    except ValueError:
        try:
            return float(item)
        except ValueError:
            return item


def _topk_estimate_one(state, k):
    import json

    if state is None or k is None or k != k:
        return None
    st = json.loads(state)
    ordered = sorted(st["c"].items(), key=lambda kv: (-kv[1], kv[0]))
    return json.dumps(
        [[_topk_item_out(item), cnt] for item, cnt in ordered[:int(k)]],
        separators=(",", ":"))


def _flatten_deep_one(text, recursive: bool, mode: str):
    """FLATTEN with RECURSIVE/MODE semantics over one JSON-text value
    (Snowflake FLATTEN args the plain lateral-view rendering cannot
    express). Pre-order walk: each element row precedes its children;
    object keys in the engine's canonical sorted order; paths use
    Snowflake's `a.b[0]` spelling. MODE gates which CONTAINER kinds
    expand — an object met under mode ARRAY is a leaf. Values keep the
    textual-VARIANT contract (scalars bare, containers compact
    canonical JSON). NULL/invalid input → NULL (OUTER decides whether
    a row survives)."""
    import json as _json

    if text is None or (isinstance(text, float) and text != text):
        return None
    try:
        v = _json.loads(text)
    except Exception:
        return None

    def jtext(x):
        if x is None:
            return None
        if isinstance(x, str):
            return x
        if isinstance(x, bool):
            return "true" if x else "false"
        if isinstance(x, (dict, list)):
            return _json.dumps(x, separators=(",", ":"),
                               sort_keys=True)
        return _json.dumps(x)

    out: list = []

    def walk(c, prefix):
        if isinstance(c, dict) and mode in ("OBJECT", "BOTH"):
            for k in sorted(c):
                p = f"{prefix}.{k}" if prefix else k
                out.append((k, None, p, jtext(c[k])))
                if recursive and isinstance(c[k], (dict, list)):
                    walk(c[k], p)
        elif isinstance(c, list) and mode in ("ARRAY", "BOTH"):
            for i, el in enumerate(c):
                p = f"{prefix}[{i}]"
                out.append((None, i, p, jtext(el)))
                if recursive and isinstance(el, (dict, list)):
                    walk(el, p)

    walk(v, "")
    return out


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

    @pandas_udf(StringType())
    def approx_percentile_accumulate(v: pd.Series) -> str:
        return _pctl_state_from_values(v)

    @pandas_udf(StringType())
    def approx_percentile_combine(s: pd.Series) -> str:
        return _pctl_merge_states(s)

    @pandas_udf(DoubleType())
    def approx_percentile_estimate(
        state: pd.Series, p: pd.Series,
    ) -> pd.Series:
        return pd.Series(
            [_pctl_estimate_one(s, pp) for s, pp in zip(state, p)],
            dtype="float64",
        )

    @pandas_udf(StringType())
    def approx_top_k_accumulate(v: pd.Series, cap: pd.Series) -> str:
        c0 = cap.iloc[0] if len(cap) else None
        c = _TOPK_DEFAULT if c0 is None or pd.isna(c0) else int(c0)
        return _topk_state_from_values(v, min(c, _TOPK_CAP))

    @pandas_udf(StringType())
    def approx_top_k_combine(s: pd.Series) -> str:
        return _topk_merge_states(s)

    @pandas_udf(StringType())
    def approx_top_k_estimate(
        state: pd.Series, k: pd.Series,
    ) -> pd.Series:
        return pd.Series(
            [_topk_estimate_one(s, kk) for s, kk in zip(state, k)],
            dtype=object,
        )

    from pyspark.sql.types import (
        ArrayType, IntegerType, StructField as _SF,
        StructType as _ST,
    )

    _FLAT_ROW = _ST([
        _SF("key", StringType()),
        _SF("index", IntegerType()),
        _SF("path", StringType()),
        _SF("value", StringType()),
    ])

    @pandas_udf(ArrayType(_FLAT_ROW))
    def flatten_deep_x(
        text: pd.Series, recursive: pd.Series, mode: pd.Series,
    ) -> pd.Series:
        return pd.Series(
            [_flatten_deep_one(t, bool(r), m)
             for t, r, m in zip(text, recursive, mode)],
            dtype=object,
        )

    spark.udf.register("flatten_deep_x", flatten_deep_x)
    spark.udf.register("approx_top_k_accumulate",
                       approx_top_k_accumulate)
    spark.udf.register("approx_top_k_combine", approx_top_k_combine)
    spark.udf.register("approx_top_k_estimate", approx_top_k_estimate)
    spark.udf.register("compress", compress)
    spark.udf.register("decompress_binary", decompress_binary)
    spark.udf.register("decompress_string", decompress_string)
    spark.udf.register("approx_percentile_accumulate",
                       approx_percentile_accumulate)
    spark.udf.register("approx_percentile_combine",
                       approx_percentile_combine)
    spark.udf.register("approx_percentile_estimate",
                       approx_percentile_estimate)
    # only mark AFTER everything registered — a failed first attempt
    # must not poison later engines on this session (r7 review)
    spark._icebreaker_udfs_registered = True
