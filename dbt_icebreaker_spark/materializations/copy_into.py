"""COPY INTO execution (path-based form).

Snowflake's COPY INTO loads files into an existing table. The
reference routes every COPY INTO to the cloud (it cannot run one
locally at all — `connections.py` routes on the statement pattern);
here the common path-based form executes natively: the FROM location
is a filesystem/object-store path and the load is a schema-aligned
``spark.read`` → append. Stage-based forms (``FROM @stage``) still
refuse actionably — Spark has no stage objects; use direct paths.

Supported surface (the core dbt-seeds/backfill usage):
    COPY INTO <table> FROM '<path>'
        [FILE_FORMAT = (TYPE = CSV|PARQUET|JSON
                        [SKIP_HEADER = 1] [FIELD_DELIMITER = '<c>']
                        [FIELD_OPTIONALLY_ENCLOSED_BY = '<c>'])]
        [PATTERN = '<regex>']
Anything else (transformations in the FROM, credentials, ON_ERROR
policies) raises with the exact unsupported clause named.

Load semantics per Snowflake: CSV maps by POSITION against the
target's declared schema (the read is schema-applied, so types cast
during parse); parquet/json map by NAME. The target table must
already exist — same contract as Snowflake.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import SparkSession

_COPY_RE = re.compile(
    r"^\s*COPY\s+INTO\s+(?P<table>[\w.]+)\s+FROM\s+(?P<src>@?'[^']*'|@[\w.$/]+)"
    r"(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_TYPE_RE = re.compile(r"TYPE\s*=\s*'?(\w+)'?", re.IGNORECASE)
_SKIP_RE = re.compile(r"SKIP_HEADER\s*=\s*(\d+)", re.IGNORECASE)
_DELIM_RE = re.compile(r"FIELD_DELIMITER\s*=\s*'([^']*)'", re.IGNORECASE)
_QUOTE_RE = re.compile(
    r"FIELD_OPTIONALLY_ENCLOSED_BY\s*=\s*'([^']*)'", re.IGNORECASE
)
_PATTERN_RE = re.compile(r"PATTERN\s*=\s*'([^']*)'", re.IGNORECASE)
_UNSUPPORTED = (
    "ON_ERROR", "CREDENTIALS", "STORAGE_INTEGRATION", "VALIDATION_MODE",
    "MATCH_BY_COLUMN_NAME", "FORCE", "PURGE",
)


@dataclass
class CopySpec:
    table: str
    path: str
    fmt: str = "csv"
    options: dict = field(default_factory=dict)
    pattern: Optional[str] = None


def parse_copy_into(sql: str) -> Optional[CopySpec]:
    """CopySpec for a path-based COPY INTO; None when the statement is
    not COPY INTO; TranspileError for stage-based / unsupported
    clauses."""
    m = _COPY_RE.match(sql.strip().rstrip(";"))
    if not m:
        return None
    from ..transpiler.core import TranspileError

    src = m.group("src")
    if src.startswith("@"):
        raise TranspileError(
            "COPY INTO FROM @stage: Spark has no stage objects — use a "
            "direct path: COPY INTO t FROM '/data/files/' "
            "FILE_FORMAT = (TYPE = PARQUET)"
        )
    rest = m.group("rest") or ""
    for kw in _UNSUPPORTED:
        if re.search(rf"\b{kw}\b", rest, re.IGNORECASE):
            raise TranspileError(
                f"COPY INTO option {kw} is not supported in the local "
                "engine — load with explicit spark.read options instead"
            )
    fmt = "csv"
    tm = _TYPE_RE.search(rest)
    if tm:
        fmt = tm.group(1).lower()
    if fmt not in ("csv", "parquet", "json"):
        raise TranspileError(
            f"COPY INTO file format {fmt!r}: supported here are "
            "CSV / PARQUET / JSON"
        )
    options: dict = {}
    if fmt == "csv":
        sk = _SKIP_RE.search(rest)
        options["header"] = "true" if (sk and int(sk.group(1)) >= 1) else "false"
        dm = _DELIM_RE.search(rest)
        if dm:
            options["sep"] = dm.group(1)
        qm = _QUOTE_RE.search(rest)
        if qm:
            options["quote"] = qm.group(1)
    pm = _PATTERN_RE.search(rest)
    return CopySpec(
        table=m.group("table"),
        path=src[1:-1],
        fmt=fmt,
        options=options,
        pattern=pm.group(1) if pm else None,
    )


def run_copy_into(spark: SparkSession, spec: CopySpec) -> dict:
    """Execute a parsed COPY INTO: schema-aligned read + append."""
    if not spark.catalog.tableExists(spec.table):
        raise ValueError(
            f"COPY INTO target {spec.table} does not exist — create the "
            "table first (same contract as the warehouse)"
        )
    target_schema = spark.table(spec.table).schema
    reader = spark.read.options(**spec.options)
    if spec.pattern:
        reader = reader.option("pathGlobFilter", spec.pattern)
    if spec.fmt == "csv":
        # positional mapping: parse WITH the target schema so types
        # cast during the read (Snowflake CSV semantics)
        df = reader.schema(target_schema).csv(spec.path)
    elif spec.fmt == "json":
        df = reader.json(spec.path)
    else:
        df = reader.parquet(spec.path)
    if spec.fmt in ("parquet", "json"):
        # by-name mapping with casts to the target's declared types
        cols = []
        for f_ in target_schema.fields:
            if f_.name not in df.columns:
                raise ValueError(
                    f"COPY INTO: source is missing target column "
                    f"{f_.name!r} (by-name mapping for {spec.fmt})"
                )
            cols.append(df[f_.name].cast(f_.dataType).alias(f_.name))
        df = df.select(*cols)
    n = df.count()
    df.write.mode("append").insertInto(spec.table)
    return {"table": spec.table, "rows_loaded": n, "format": spec.fmt}
