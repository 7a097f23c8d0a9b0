"""Snowflake-dialect → Spark SQL transpiler (SURVEY §2.3).

Public surface mirrors the reference's
`dbt/adapters/icebreaker/transpiler.py` Transpiler class
(`to_duckdb` → `to_spark`, `can_transpile`,
`detect_blacklisted_functions`) but is built on a lossless in-house
tokenizer instead of sqlglot (not available in this environment).
"""

from .core import Transpiler, TranspileError, UnsupportedFunctionError
from .transforms import detect_blacklisted_functions

__all__ = [
    "Transpiler",
    "TranspileError",
    "UnsupportedFunctionError",
    "detect_blacklisted_functions",
]
