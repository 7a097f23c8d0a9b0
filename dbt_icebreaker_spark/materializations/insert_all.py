"""Snowflake multi-table INSERT execution.

``INSERT [OVERWRITE] {ALL | FIRST} [WHEN cond THEN] INTO t [(cols)]
[VALUES (exprs)] … [ELSE INTO …] <select>`` — the classic one-scan
ETL fan-out. Spark has no multi-table INSERT statement, so the engine
parses the form and lowers it the way a Spark user would hand-write
it: evaluate the source ONCE (cached temp view), then one
``INSERT INTO target SELECT exprs FROM src WHERE branch-filter`` per
INTO clause.

Semantics preserved (Snowflake docs, multi-table inserts):
- ALL:   every WHEN whose condition is true fires ALL its INTOs;
- FIRST: only the first true WHEN fires (filters carry
  ``AND NOT(prior conds)``);
- ELSE:  fires when no WHEN matched;
- unconditional INTOs (no WHEN anywhere) fire for every row;
- OVERWRITE truncates every target up front;
- VALUES expressions reference the select's output columns; an INTO
  without VALUES inserts the full source row.

The source is evaluated once and cached — the per-branch filters are
cheap column predicates over the cached rows, so N branches cost one
source scan + N filtered writes, the same plan a 100 TB pipeline
wants (no re-read of the source per target).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from ..transpiler.tokenizer import (
    COMMENT,
    QIDENT,
    WORD,
    WS,
    find_matching_paren,
    next_code,
    render,
    split_args,
    tokenize,
)


@dataclass
class IntoClause:
    table: str
    columns: Optional[list[str]] = None   # None = full row
    values: Optional[list[str]] = None    # None = full row
    when: Optional[str] = None            # branch condition text
    when_idx: Optional[int] = None        # index of the owning WHEN
                                          # clause (identity — two WHENs
                                          # with identical text are
                                          # still distinct clauses)
    is_else: bool = False


@dataclass
class InsertAllSpec:
    first: bool                # INSERT FIRST vs INSERT ALL
    overwrite: bool
    intos: list[IntoClause] = field(default_factory=list)
    select_sql: str = ""


def parse_insert_all(sql: str):
    """Return an InsertAllSpec or None when the statement is not a
    multi-table insert (plain INSERT INTO runs natively)."""
    toks = tokenize(sql)
    i = next_code(toks, 0)
    if i >= len(toks) or not toks[i].is_word("INSERT"):
        return None
    i = next_code(toks, i + 1)
    overwrite = False
    if i < len(toks) and toks[i].is_word("OVERWRITE"):
        overwrite = True
        i = next_code(toks, i + 1)
    if i >= len(toks) or not toks[i].is_word("ALL", "FIRST"):
        return None
    spec = InsertAllSpec(first=toks[i].is_word("FIRST"), overwrite=overwrite)
    i = next_code(toks, i + 1)

    def read_name(j):
        parts = []
        while j < len(toks) and toks[j].kind in (WORD, QIDENT):
            parts.append(toks[j].text.strip('"'))
            k = next_code(toks, j + 1)
            if k < len(toks) and toks[k].is_op("."):
                j = next_code(toks, k + 1)
            else:
                return ".".join(parts), k
        return None, j

    current_when: Optional[str] = None
    current_when_idx: Optional[int] = None
    n_whens = 0
    in_else = False
    while i < len(toks):
        t = toks[i]
        if t.is_word("WHEN"):
            # condition runs until the matching top-level THEN
            j = next_code(toks, i + 1)
            depth = 0
            case0 = 0  # a CASE in the condition owns its THEN/END
            lo = j
            while j < len(toks):
                tk = toks[j]
                if tk.is_op("("):
                    depth += 1
                elif tk.is_op(")"):
                    depth -= 1
                elif depth == 0 and tk.is_word("CASE"):
                    case0 += 1
                elif depth == 0 and tk.is_word("END") and case0 > 0:
                    case0 -= 1
                elif depth == 0 and case0 == 0 and tk.is_word("THEN"):
                    break
                j += 1
            if j >= len(toks):
                return None
            current_when = render(toks[lo:j]).strip()
            current_when_idx = n_whens
            n_whens += 1
            in_else = False
            i = next_code(toks, j + 1)
            continue
        if t.is_word("ELSE"):
            in_else = True
            current_when = None
            current_when_idx = None
            i = next_code(toks, i + 1)
            continue
        if t.is_word("INTO"):
            i = next_code(toks, i + 1)
            name, i = read_name(i)
            if not name:
                return None
            into = IntoClause(
                table=name, when=current_when,
                when_idx=current_when_idx, is_else=in_else,
            )
            if i < len(toks) and toks[i].is_op("("):
                close = find_matching_paren(toks, i)
                into.columns = [
                    toks[k].text.strip('"')
                    for lo, hi in split_args(toks, i + 1, close)
                    for k in range(lo, hi)
                    if toks[k].kind in (WORD, QIDENT)
                ]
                i = next_code(toks, close + 1)
            if i < len(toks) and toks[i].is_word("VALUES"):
                i = next_code(toks, i + 1)
                if i >= len(toks) or not toks[i].is_op("("):
                    return None
                close = find_matching_paren(toks, i)
                into.values = [
                    render(toks[lo:hi]).strip()
                    for lo, hi in split_args(toks, i + 1, close)
                ]
                i = next_code(toks, close + 1)
            spec.intos.append(into)
            continue
        # anything else at this level starts the source query
        break
    if not spec.intos or i >= len(toks):
        return None
    spec.select_sql = render(toks[i:]).strip().rstrip(";")
    if not spec.select_sql.upper().startswith(("SELECT", "WITH", "(")):
        return None
    return spec


def run_insert_all(spark, spec: InsertAllSpec, transpiler, execute_fn) -> dict:
    import uuid as _uuid

    src = execute_fn(spec.select_sql)
    if spec.overwrite:
        # Materialize BEFORE truncating: the select may read from a
        # target table, and Snowflake evaluates the subquery against
        # pre-truncate data. cache()+count() is NOT enough — TRUNCATE
        # TABLE invalidates dependent caches and the insert would
        # recompute from the emptied table. localCheckpoint cuts the
        # lineage so the pre-truncate rows are pinned.
        src = src.localCheckpoint(eager=True)
    else:
        src = src.cache()
    view = f"__icebreaker_mti_{_uuid.uuid4().hex[:8]}"
    src.createOrReplaceTempView(view)
    try:
        # ALL WHEN-clause conditions in statement order. Clause IDENTITY
        # (when_idx), not text: two WHENs spelled identically are still
        # distinct clauses, and under FIRST only the earlier one fires.
        when_conds: list[str] = []
        for into in spec.intos:
            if into.when_idx is not None and into.when_idx == len(when_conds):
                when_conds.append(into.when)

        # Snowflake routing is on "evaluates to TRUE": a NULL condition
        # neither fires its WHEN nor blocks ELSE — so branch filters use
        # IS [NOT] TRUE, never bare NOT(cond) (NULL-poisoned).
        def branch_filter(into: IntoClause) -> str:
            if into.is_else:
                if not when_conds:
                    return "TRUE"
                return " AND ".join(
                    f"({c}) IS NOT TRUE" for c in when_conds
                )
            if into.when is None:
                return "TRUE"
            cond = f"({into.when}) IS TRUE"
            if spec.first:
                for p in when_conds[:into.when_idx]:
                    cond += f" AND ({p}) IS NOT TRUE"
            return cond

        if spec.overwrite:
            for tbl in dict.fromkeys(i2.table for i2 in spec.intos):
                spark.sql(f"TRUNCATE TABLE {tbl}")

        filters = [branch_filter(into) for into in spec.intos]
        for into, filt in zip(spec.intos, filters):
            cols = f" ({', '.join(into.columns)})" if into.columns else ""
            vals = ", ".join(into.values) if into.values else "*"
            stmt = (
                f"INSERT INTO {into.table}{cols} "
                f"SELECT {vals} FROM {view} WHERE {filt}"
            )
            spark.sql(transpiler.to_spark(stmt))
        # all branch counts in ONE pass over the cached source, not one
        # COUNT job per INTO
        count_exprs = ", ".join(
            f"COUNT(CASE WHEN {f} THEN 1 END)" for f in filters
        )
        counts = spark.sql(
            transpiler.to_spark(f"SELECT {count_exprs} FROM {view}")
        ).collect()[0]
        return {"table": ", ".join(dict.fromkeys(i2.table for i2 in spec.intos)),
                "rows_affected": sum(counts)}
    finally:
        spark.catalog.dropTempView(view)
        if not spec.overwrite:
            src.unpersist()
