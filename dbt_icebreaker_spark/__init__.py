"""spark-icebreaker: a PySpark-native engine with the query and
data-processing capabilities of tysondoberneck/dbt-icebreaker.

Blueprint: SURVEY.md. Reference (read-only): /root/reference/.
"""

from .errors import ExecutionError, IcebreakerError
from .runner import IcebreakerEngine, RunResult
from .session import get_spark
from .transpiler import Transpiler, TranspileError, UnsupportedFunctionError

__version__ = "0.1.0"

__all__ = [
    "IcebreakerEngine",
    "RunResult",
    "IcebreakerError",
    "ExecutionError",
    "get_spark",
    "Transpiler",
    "TranspileError",
    "UnsupportedFunctionError",
]
