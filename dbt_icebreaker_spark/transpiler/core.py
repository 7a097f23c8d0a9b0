"""Transpiler entry points.

Mirrors the reference API (`transpiler.py:27-433`): parse → transform
pipeline → regenerate. Multi-statement scripts are split on top-level
';' and transpiled per statement (ref `transpiler.py:56-74`).
"""

from __future__ import annotations

from . import transforms
from .tokenizer import render, split_statements, tokenize


class TranspileError(Exception):
    """Raised when SQL cannot be converted to Spark SQL."""


class UnsupportedFunctionError(TranspileError):
    """Cloud-only function with no Spark equivalent (ref
    transpiler.py:398-433 blacklist; errors.py:43-64 actionable style).
    """

    def __init__(self, functions: list[str]):
        self.functions = functions
        fns = ", ".join(functions)
        super().__init__(
            f"Unsupported function(s): {fns}. These are cloud-only in the "
            "reference (SNOWFLAKE.CORTEX / ML.* / XML / SYSTEM$) and have "
            "no Spark implementation. Rewrite the model without them, or "
            "use the xops LLM-column operators for CORTEX-style calls."
        )


class UnsupportedTypeError(TranspileError):
    """Geospatial "toxic" type with no Spark-native representation
    (ref auto_router.py:97-101 blacklists st_* / geography;
    traffic.py:251-259 gates with reason TOXIC_TYPES). Named type
    class up front, per SURVEY §1.2's "clear unsupported-type
    refusal"."""

    def __init__(self, references: list[str]):
        self.references = references
        self.type_class = "geospatial"
        super().__init__(
            "Unsupported type class: geospatial (TOXIC_TYPES gate). "
            f"Types: {', '.join(references)}. Spark has no native "
            "GEOGRAPHY/GEOMETRY type or ST_* functions. Keep geospatial "
            "models on the warehouse, or pre-compute lon/lat doubles "
            "upstream and use plain numeric predicates."
        )


class Transpiler:
    """Snowflake SQL → Spark SQL.

    ``session_udfs=True`` declares the target SparkSession carries the
    engine-registered UDFs (COMPRESS family) — those calls pass
    through instead of refusing. Each consumer declares which
    capability set it targets at construction (r7 review)."""

    def __init__(self, session_udfs: bool = False) -> None:
        self.session_udfs = session_udfs

    def to_spark(self, sql: str) -> str:
        """Transpile one script (possibly multi-statement) to Spark SQL.

        Returns statements joined by ';' like the reference
        (`transpiler.py:56-74`).
        """
        return ";".join(self._transpile_statements(sql))

    def _transpile_statements(self, sql: str) -> list[str]:
        toxic = transforms.detect_toxic_types(sql)
        if toxic:
            raise UnsupportedTypeError(toxic)
        blacklisted = transforms.detect_blacklisted_functions(sql)
        if blacklisted:
            raise UnsupportedFunctionError(blacklisted)
        unsupported = transforms.detect_unsupported_scalars(sql)
        if unsupported:
            details = "; ".join(f"{fn} — use {sugg}" for fn, sugg in unsupported)
            raise TranspileError(
                f"Function(s) with no faithful Spark rendering: {details}."
            )
        if not self.session_udfs:
            # engine-session UDFs (COMPRESS family): the engine's own
            # transpiler sets session_udfs=True and passes them
            # through; the bare transpiler refuses with the pointer
            su = transforms.detect_session_udf_scalars(sql)
            if su:
                details = "; ".join(
                    f"{fn} — use {sugg}" for fn, sugg in su)
                raise TranspileError(
                    f"Function(s) available only through the engine "
                    f"session: {details}."
                )
        sf_only = transforms.detect_snowflake_only_statement(sql)
        if sf_only:
            stmt, suggestion = sf_only
            raise TranspileError(
                f"Statement '{stmt}' is Snowflake-only and has no Spark "
                f"statement equivalent. Use {suggestion}."
            )
        clause = transforms.detect_unsupported_clause(sql)
        if clause:
            name, suggestion = clause
            raise TranspileError(
                f"Clause '{name}' has no Spark equivalent. Use "
                f"{suggestion}."
            )
        tt = transforms.detect_time_travel(sql)
        if tt:
            raise TranspileError(
                f"Time-travel clause {tt} is not supported on plain "
                "parquet tables (no history). On an Iceberg/Delta "
                "catalog table use Spark's `VERSION AS OF` / "
                "`TIMESTAMP AS OF` instead (see iceberg.attach_catalog)."
            )
        stmts = split_statements(tokenize(sql))
        out: list[str] = []
        for stmt in stmts:
            toks = stmt
            for fn in transforms.PIPELINE:
                toks = fn(toks)
            out.append(render(toks))
        return out

    def to_spark_statements(self, sql: str) -> list[str]:
        """Like to_spark but returns one string per statement, for
        callers that loop spark.sql() per statement (SURVEY T17).
        Statement boundaries come from the tokenizer, NOT a text split
        on ';' — a semicolon inside a generated string literal (e.g. a
        STRTOK char class) is not a boundary, while a transform that
        legitimately expands to several statements (CLONE → DROP +
        CTAS) still yields one entry per statement."""
        out: list[str] = []
        for s in self._transpile_statements(sql):
            for sub in split_statements(tokenize(s)):
                r = render(sub)
                if r.strip():
                    out.append(r)
        return out

    def can_transpile(self, sql: str) -> tuple[bool, str | None]:
        """Probe used by routing Gate 3 (ref transpiler.py:385-396,
        traffic.py:241-248)."""
        try:
            self.to_spark(sql)
            return True, None
        except Exception as exc:  # noqa: BLE001 - probe contract
            return False, str(exc)
