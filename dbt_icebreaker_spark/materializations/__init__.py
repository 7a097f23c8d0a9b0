from .ddl import Ddl
from .incremental import run_incremental
from .snapshot import run_snapshot

__all__ = ["Ddl", "run_incremental", "run_snapshot"]
