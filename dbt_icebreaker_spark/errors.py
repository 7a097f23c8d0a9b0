"""Actionable runtime errors (SURVEY §2 R-surface; ref
`errors.py:11-64` base class shape, `connections.py:352-371`
string-match classification of execution failures).

The reference classifies DuckDB execution errors (missing function,
VARIANT type, not-implemented) and re-routes or re-raises with an
actionable message. Here the equivalent surface is Spark's error
conditions: `AnalysisException.getCondition()` exposes a stable error
class (UNRESOLVED_COLUMN, UNRESOLVED_ROUTINE, …) which maps to a
message + concrete suggestion, instead of a raw stack trace, for the
failures every user hits (typo'd column, Snowflake-only function that
slipped through, unregistered table, bad cast, syntax).
"""

from __future__ import annotations

import re
from typing import Optional


class IcebreakerError(Exception):
    """Base error: message + actionable suggestion (+ docs pointer).
    Mirrors ref `errors.py:11-40` format()."""

    def __init__(
        self,
        message: str,
        suggestion: Optional[str] = None,
        docs_url: Optional[str] = None,
    ):
        self.message = message
        self.suggestion = suggestion
        self.docs_url = docs_url
        super().__init__(self.format())

    def format(self) -> str:
        lines = [f"Error: {self.message}"]
        if self.suggestion:
            lines.append("")
            lines.append(f"Suggestion: {self.suggestion}")
        if self.docs_url:
            lines.append(f"Docs: {self.docs_url}")
        return "\n".join(lines)


class ExecutionError(IcebreakerError):
    """A model's SQL failed at Spark execution time, classified into
    an actionable message. `.condition` keeps the Spark error class
    and `.__cause__` the original exception."""

    def __init__(self, condition: str, message: str, suggestion: str):
        self.condition = condition
        super().__init__(message=message, suggestion=suggestion)


_BACKTICKED = re.compile(r"`([^`]+)`")


def _names(exc_msg: str, limit: int = 4) -> list[str]:
    return _BACKTICKED.findall(exc_msg)[:limit]


def classify_execution_error(exc: Exception, sql: str = "") -> Optional[ExecutionError]:
    """Map a PySpark exception to an actionable ExecutionError, or
    None if unrecognized (caller re-raises the original)."""
    get_cond = getattr(exc, "getCondition", None) or getattr(exc, "getErrorClass", None)
    try:
        condition = get_cond() if get_cond else None
    except Exception:
        condition = None
    condition = condition or ""
    msg = str(exc)
    names = _names(msg)

    if condition.startswith("UNRESOLVED_COLUMN"):
        col = names[0] if names else "<unknown>"
        hint = ""
        if "Did you mean" in msg and len(names) > 1:
            hint = f" Did you mean one of: {', '.join(names[1:])}?"
        return ExecutionError(
            condition,
            f"Column '{col}' does not exist in the model's input.{hint}",
            "Check the column name against the source table / upstream "
            "CTE — aliases defined in the same SELECT cannot be "
            "referenced in WHERE (use QUALIFY/subquery or repeat the "
            "expression).",
        )
    if condition.startswith("UNRESOLVED_ROUTINE"):
        fn = names[0] if names else "<unknown>"
        return ExecutionError(
            condition,
            f"Function '{fn}' is not available in Spark SQL.",
            "If this is a Snowflake function, run the SQL through the "
            "engine (transpiler) rather than spark.sql directly — "
            "supported Snowflake functions are rewritten automatically; "
            "can_transpile(sql) reports unsupported ones up front.",
        )
    if condition.startswith("TABLE_OR_VIEW_NOT_FOUND"):
        tbl = names[0] if names else "<unknown>"
        return ExecutionError(
            condition,
            f"Table or view '{tbl}' is not registered in this session.",
            "Register parquet sources with sources.register_dir(spark, "
            "dir) or cache warehouse tables via SourceCache.register; "
            "for models, check the upstream model ran first (DAG order).",
        )
    if condition.startswith("CAST_INVALID_INPUT") or condition.startswith(
        "DATATYPE_MISMATCH"
    ):
        return ExecutionError(
            condition,
            "A value or expression has an incompatible type for this "
            "operation." + (f" ({names[0]})" if names else ""),
            "Use TRY_CAST (or Snowflake TRY_TO_NUMBER/TRY_TO_DATE — "
            "transpiled automatically) to turn bad values into NULL "
            "instead of failing the whole model.",
        )
    if condition.startswith("PARSE_SYNTAX_ERROR"):
        return ExecutionError(
            condition,
            "The SQL could not be parsed by Spark.",
            "If the statement uses Snowflake-only syntax, run it "
            "through the engine's transpiler (engine.execute / "
            "run_model); can_transpile(sql) explains unsupported "
            "statements with alternatives.",
        )
    if condition.startswith("PARQUET_TYPE_ILLEGAL"):
        return ExecutionError(
            condition,
            "A parquet column uses a physical type Spark cannot read "
            "directly (typically TIMESTAMP(NANOS))."
            + (f" ({names[0]})" if names else ""),
            "Read through sources.read_parquet / register_dir (or "
            "session.get_spark), which set "
            "spark.sql.legacy.parquet.nanosAsLong and convert ns "
            "columns to timestamps — a bare spark.read.parquet on an "
            "unconfigured session cannot open these files.",
        )
    if condition.startswith("PATH_NOT_FOUND"):
        return ExecutionError(
            condition,
            "A data path referenced by the statement does not exist."
            + (f" ({names[0]})" if names else ""),
            "Check the path (COPY INTO FROM '<path>' and spark.read "
            "take filesystem/object-store paths, not stage names); "
            "for parquet test data, register_dir(spark, sf_dir) lists "
            "what exists.",
        )
    if condition.startswith("RECURSION_LEVEL_LIMIT_EXCEEDED") or (
        "RECURSION_LEVEL_LIMIT_EXCEEDED" in msg
    ):
        return ExecutionError(
            "RECURSION_LEVEL_LIMIT_EXCEEDED",
            "A recursive query (WITH RECURSIVE / CONNECT BY) exceeded "
            "the recursion level limit — the hierarchy is deeper than "
            "spark.sql.cteRecursionLevelLimit (default 100, matching "
            "Snowflake's MAX_RECURSIONS default).",
            "Raise the limit for deep chains: spark.conf.set('spark."
            "sql.cteRecursionLevelLimit', <max depth>). If the data "
            "may contain cycles, add NOCYCLE (CONNECT BY NOCYCLE "
            "PRIOR a = b) so cyclic branches terminate instead of "
            "recursing forever. Very wide deep hierarchies also honor "
            "spark.sql.cteRecursionRowLimit (default 1e6 rows).",
        )
    if condition.startswith("DIVIDE_BY_ZERO"):
        return ExecutionError(
            condition,
            "Division by zero under ANSI semantics.",
            "Use DIV0(a, b) / DIV0NULL(a, b) (transpiled to a guarded "
            "division) or NULLIF(b, 0) in the denominator.",
        )
    return None


def raise_classified(exc: Exception, sql: str = "") -> None:
    """Raise the classified form of `exc` (chained), or re-raise
    `exc` unchanged when unrecognized."""
    classified = classify_execution_error(exc, sql)
    if classified is not None:
        raise classified from exc
    raise exc
