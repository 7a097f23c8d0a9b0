"""Snowflake dynamic PIVOT — ``PIVOT(agg FOR col IN (ANY [ORDER BY
…]))`` and the subquery form ``IN (SELECT …)``.

Spark's PIVOT clause needs an explicit literal list; Snowflake resolves
ANY at compile time by enumerating the distinct values of the pivot
column. This pre-pass does the same: it runs ``SELECT DISTINCT col``
against the pivot SOURCE (the table/subquery immediately before the
PIVOT keyword) on the live SparkSession and splices the sorted values
back in as literals. It therefore lives at the ENGINE layer
(``IcebreakerEngine.execute``), not in the pure string transpiler —
``can_transpile`` passes dynamic pivots through unchanged.

Scale note: the enumeration is one DISTINCT over the pivot column —
the same aggregation Snowflake's compiler runs; the pivot itself then
plans as an ordinary Spark PIVOT (map-side partial aggregation).
NULL pivot values are skipped (a NULL cannot be a literal column
label; Snowflake drops them too).
"""

from __future__ import annotations

import datetime as _dt

from .tokenizer import (
    QIDENT,
    WORD,
    find_matching_paren,
    next_code,
    prev_code,
    render,
    tokenize,
)


def _literal(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, _dt.datetime):
        return "'" + v.isoformat(sep=" ") + "'"
    if isinstance(v, _dt.date):
        return "'" + v.isoformat() + "'"
    return "'" + str(v).replace("'", "''") + "'"


def _find_dynamic_in(toks):
    """Locate one `PIVOT ( agg FOR col IN ( <dynamic> ) )`; returns
    (src_lo, in_open, in_close, col_text, kind) where kind is 'any' or
    'subquery', else None."""
    n = len(toks)
    for i, t in enumerate(toks):
        if not (t.kind == WORD and t.upper == "PIVOT"):
            continue
        j = next_code(toks, i + 1)
        if j >= n or not toks[j].is_op("("):
            continue
        close = find_matching_paren(toks, j)
        # inside: find FOR ... IN ( ... ) at depth 0 of the pivot body
        depth = 0
        k = j + 1
        for_i = in_i = -1
        while k < close:
            tk = toks[k]
            if tk.is_op("("):
                depth += 1
            elif tk.is_op(")"):
                depth -= 1
            elif depth == 0 and tk.kind == WORD:
                if tk.upper == "FOR" and for_i < 0:
                    for_i = k
                elif tk.upper == "IN" and for_i >= 0 and in_i < 0:
                    in_i = k
            k += 1
        if for_i < 0 or in_i < 0:
            continue
        in_open = next_code(toks, in_i + 1)
        if in_open >= n or not toks[in_open].is_op("("):
            continue
        in_close = find_matching_paren(toks, in_open)
        body = toks[in_open + 1:in_close]
        b0 = next_code(body, 0)
        kind = None
        any_tail = ""
        if b0 < len(body) and body[b0].is_word("ANY"):
            kind = "any"
            any_tail = render(body[b0 + 1:]).strip()
        elif b0 < len(body) and body[b0].is_word("SELECT"):
            kind = "subquery"
        if kind is None:
            continue
        col_text = render(toks[next_code(toks, for_i + 1):in_i]).strip()
        src_lo = _source_start(toks, i)
        return (src_lo, i, in_open, in_close, col_text, kind, any_tail)
    return None


def _paren_group_start(toks, close_i: int) -> int:
    """Index of the '(' matching the ')' at ``close_i``."""
    depth = 0
    lo = close_i
    while lo >= 0:
        if toks[lo].is_op(")"):
            depth += 1
        elif toks[lo].is_op("("):
            depth -= 1
            if depth == 0:
                break
        lo -= 1
    return lo


def _name_run_start(toks, end_i: int) -> int:
    """Start index of the contiguous word/qident/dot run ending at
    ``end_i`` (a dotted table name or a bare alias)."""
    lo = end_i
    while lo >= 0 and (
        toks[lo].kind in (WORD, QIDENT) or toks[lo].is_op(".")
    ):
        lo -= 1
    return lo + 1


_FROM_KEYWORDS = frozenset((
    "FROM", "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS",
    "NATURAL", "SEMI", "ANTI", "LATERAL", "ON", "USING", "WHERE",
    "SELECT", "UNION", "ALL", "EXCEPT", "INTERSECT",
))


def _source_start(toks, pivot_i: int) -> int:
    """Start index of the pivot SOURCE — the table reference or
    parenthesized subquery (with its optional [AS] alias) immediately
    before the PIVOT keyword. The enumeration probe selects FROM this
    whole segment, so an aliased subquery `(SELECT …) s PIVOT` or a
    bare-aliased table `orders o PIVOT` probes the real source, not
    the alias name."""
    p = prev_code(toks, pivot_i - 1)
    if p >= 0 and toks[p].is_op(")"):
        return _paren_group_start(toks, p)
    # word run: a dotted table name, or an alias trailing the source
    run_lo = _name_run_start(toks, p)
    q = prev_code(toks, run_lo - 1)
    if q >= 0 and toks[q].is_word("AS"):
        q2 = prev_code(toks, q - 1)
        if q2 >= 0 and toks[q2].is_op(")"):
            return _paren_group_start(toks, q2)  # (SELECT …) AS s
        if q2 >= 0 and toks[q2].kind in (WORD, QIDENT):
            return _name_run_start(toks, q2)  # t AS s
        return run_lo
    if q >= 0 and toks[q].is_op(")"):
        return _paren_group_start(toks, q)  # (SELECT …) s
    if (
        q >= 0
        and (toks[q].kind == QIDENT
             or (toks[q].kind == WORD and toks[q].upper not in _FROM_KEYWORDS))
    ):
        return _name_run_start(toks, q)  # t s (bare alias, no AS)
    return run_lo


def _with_prefix(toks) -> str:
    """The statement's leading WITH clause text (up to the main
    depth-0 SELECT), so enumeration probes can resolve CTE-defined
    pivot sources. Empty string when the statement has no WITH."""
    j = next_code(toks, 0)
    if j >= len(toks) or not toks[j].is_word("WITH"):
        return ""
    depth = 0
    for i in range(j, len(toks)):
        t = toks[i]
        if t.is_op("("):
            depth += 1
        elif t.is_op(")"):
            depth -= 1
        elif depth == 0 and t.kind == WORD and t.upper == "SELECT":
            return render(toks[:i]).strip() + " "
    return ""


def _has_top_order_by(toks) -> bool:
    depth = 0
    for i, t in enumerate(toks):
        if t.is_op("("):
            depth += 1
        elif t.is_op(")"):
            depth -= 1
        elif depth == 0 and t.kind == WORD and t.upper == "ORDER":
            j = next_code(toks, i + 1)
            if j < len(toks) and toks[j].is_word("BY"):
                return True
    return False


def resolve_dynamic_pivot(spark, sql: str, transpiler) -> str:
    """Rewrite every dynamic PIVOT in ``sql`` to an explicit IN list by
    enumerating the values on ``spark``. Non-pivot SQL returns
    unchanged (single cheap token scan)."""
    if "PIVOT" not in sql.upper() or (
        "ANY" not in sql.upper() and "SELECT" not in sql.upper()
    ):
        return sql
    toks = tokenize(sql)
    while True:
        hit = _find_dynamic_in(toks)
        if hit is None:
            return render(toks)
        src_lo, pivot_i, in_open, in_close, col, kind, any_tail = hit
        prefix = _with_prefix(toks)  # CTE-defined sources stay resolvable
        if kind == "any":
            src = render(toks[src_lo:pivot_i]).strip()
            if any_tail:
                up = any_tail.upper().split()
                if up[:2] != ["ORDER", "BY"]:
                    raise ValueError(
                        "dynamic PIVOT: only ORDER BY may follow ANY "
                        f"(got {any_tail!r})"
                    )
                order = any_tail  # honor the user's direction
            else:
                order = "ORDER BY 1"
            probe = (
                f"{prefix}SELECT DISTINCT {col} FROM {src} "
                f"WHERE {col} IS NOT NULL {order}"
            )
            sort_lits = False
        else:
            body = toks[in_open + 1:in_close]
            probe = prefix + render(body).strip()
            # an unordered subquery returns rows in engine-undefined
            # order — sort the literals so column order is stable
            sort_lits = not _has_top_order_by(body)
        rows = spark.sql(transpiler.to_spark(probe)).collect()
        seen: set[str] = set()
        lits: list[str] = []
        for r in rows:
            lit = _literal(r[0])
            if lit is not None and lit not in seen:
                seen.add(lit)
                lits.append(lit)  # dedup preserving the probe's order
        if sort_lits:
            lits.sort()
        if not lits:
            raise ValueError(
                f"dynamic PIVOT on {col}: no non-NULL values to pivot "
                "(the IN (ANY) enumeration returned nothing)"
            )
        toks = (
            toks[: in_open + 1]
            + tokenize(", ".join(lits))
            + toks[in_close:]
        )

# ---------------------------------------------------------------------
# PIVOT … DEFAULT ON NULL (expr): Spark's PIVOT fills ABSENT
# (group, value) combos with NULL after the aggregation, so no
# expression inside the pivot can supply the default. The faithful
# rendering is conditional aggregation — one `agg FILTER (WHERE col =
# value)` per pivot value wrapped in COALESCE — which needs the
# source's column list (the implicit group-by), so it lives at the
# engine layer like the dynamic-IN resolver above. Runs AFTER
# resolve_dynamic_pivot, so IN lists are literal by now.


def _find_pivot_default(toks):
    """Locate `src PIVOT ( aggs FOR col IN ( literals ) DEFAULT ON
    NULL ( expr ) )`; returns (src_lo, pivot_i, pivot_close, for_i,
    in_open, in_close, dflt_lo, d_open, d_close, col_text) or None."""
    n = len(toks)
    for i, t in enumerate(toks):
        if not (t.kind == WORD and t.upper == "PIVOT"):
            continue
        j = next_code(toks, i + 1)
        if j >= n or not toks[j].is_op("("):
            continue
        close = find_matching_paren(toks, j)
        depth = 0
        k = j + 1
        for_i = in_i = dflt_i = -1
        while k < close:
            tk = toks[k]
            if tk.is_op("("):
                depth += 1
            elif tk.is_op(")"):
                depth -= 1
            elif depth == 0 and tk.kind == WORD:
                if tk.upper == "FOR" and for_i < 0:
                    for_i = k
                elif tk.upper == "IN" and for_i >= 0 and in_i < 0:
                    in_i = k
                elif tk.upper == "DEFAULT" and in_i >= 0 and dflt_i < 0:
                    p1 = next_code(toks, k + 1)
                    p2 = next_code(toks, p1 + 1) if p1 < close else close
                    if (p1 < close and toks[p1].is_word("ON")
                            and p2 < close and toks[p2].is_word("NULL")):
                        dflt_i = k
            k += 1
        if for_i < 0 or in_i < 0 or dflt_i < 0:
            continue
        in_open = next_code(toks, in_i + 1)
        if in_open >= n or not toks[in_open].is_op("("):
            continue
        in_close = find_matching_paren(toks, in_open)
        p = next_code(toks, dflt_i + 1)   # ON
        p = next_code(toks, p + 1)        # NULL
        d_open = next_code(toks, p + 1)
        if d_open >= n or not toks[d_open].is_op("("):
            continue
        d_close = find_matching_paren(toks, d_open)
        col_text = render(toks[next_code(toks, for_i + 1):in_i]).strip()
        src_lo = _source_start(toks, i)
        return (src_lo, i, close, j, for_i, in_open, in_close,
                d_open, d_close, col_text)
    return None


def _split_commas(toks, lo, hi):
    depth = 0
    out = []
    start = lo
    for k in range(lo, hi):
        t = toks[k]
        if t.is_op("("):
            depth += 1
        elif t.is_op(")"):
            depth -= 1
        elif depth == 0 and t.is_op(","):
            out.append((start, k))
            start = k + 1
    out.append((start, hi))
    return out


def _strip_alias(toks, lo, hi):
    """(expr_hi, alias_text|None) — trailing top-level [AS] alias."""
    depth = 0
    as_i = None
    last_word = None
    for k in range(lo, hi):
        t = toks[k]
        if t.is_op("("):
            depth += 1
        elif t.is_op(")"):
            depth -= 1
        elif depth == 0 and t.kind == WORD and t.upper == "AS":
            as_i = k
    if as_i is not None:
        j = next_code(toks, as_i + 1)
        if j < hi and toks[j].kind in (WORD, QIDENT):
            return as_i, toks[j].text.strip('"')
    return hi, None


def resolve_pivot_default(spark, sql: str, transpiler) -> str:
    """Rewrite every `PIVOT … DEFAULT ON NULL (d)` into conditional
    aggregation with COALESCE — the only form whose ABSENT cells get
    the default. One schema probe (WHERE 1=0) per pivot discovers the
    implicit group-by columns, exactly like Snowflake's compiler."""
    up = sql.upper()
    if "PIVOT" not in up or "DEFAULT" not in up:
        return sql
    toks = tokenize(sql)
    while True:
        hit = _find_pivot_default(toks)
        if hit is None:
            return render(toks)
        (src_lo, pivot_i, pivot_close, body_open, for_i,
         in_open, in_close, d_open, d_close, col_text) = hit
        default_sql = render(toks[d_open + 1:d_close]).strip()
        src = render(toks[src_lo:pivot_i]).strip()
        prefix = _with_prefix(toks)
        # aggregates: each must be ONE aggregate call (Snowflake's own
        # constraint), optionally aliased
        aggs = []
        for lo, hi in _split_commas(toks, body_open + 1, for_i):
            e_hi, alias = _strip_alias(toks, lo, hi)
            e_lo = next_code(toks, lo)
            fn_i = e_lo
            if (fn_i >= e_hi or toks[fn_i].kind != WORD):
                raise ValueError(
                    "PIVOT DEFAULT ON NULL: each pivot aggregate must "
                    "be a single aggregate-function call"
                )
            op_i2 = next_code(toks, fn_i + 1)
            if (op_i2 >= e_hi or not toks[op_i2].is_op("(")
                    or next_code(toks, find_matching_paren(toks, op_i2) + 1)
                    < e_hi):
                raise ValueError(
                    "PIVOT DEFAULT ON NULL: each pivot aggregate must "
                    "be a single aggregate-function call"
                )
            aggs.append((render(toks[e_lo:e_hi]).strip(), alias))
        if len(aggs) > 1 and any(a is None for _, a in aggs):
            raise ValueError(
                "PIVOT DEFAULT ON NULL with multiple aggregates: alias "
                "every aggregate (agg AS name) so output columns are "
                "nameable"
            )
        # IN values: literal [AS alias]
        vals = []
        for lo, hi in _split_commas(toks, in_open + 1, in_close):
            e_hi, alias = _strip_alias(toks, lo, hi)
            lit = render(toks[next_code(toks, lo):e_hi]).strip()
            if not lit or lit.upper() == "ANY" or lit.upper().startswith(
                "SELECT"
            ):
                raise ValueError(
                    "PIVOT DEFAULT ON NULL: dynamic IN lists must "
                    "resolve before the default rewrite (engine order "
                    "bug)" if lit else "PIVOT: empty IN entry"
                )
            name = alias if alias is not None else lit.strip("'")
            vals.append((lit, name))
        # implicit group-by = source columns minus pivot col minus
        # columns referenced by the aggregates (Spark/Snowflake rule)
        probe = f"{prefix}SELECT * FROM {src} WHERE 1 = 0"
        schema_cols = spark.sql(transpiler.to_spark(probe)).columns
        col_lower = col_text.split(".")[-1].strip('"').lower()
        agg_refs = set()
        for expr, _ in aggs:
            for tk in tokenize(expr):
                if tk.kind in (WORD, QIDENT):
                    agg_refs.add(tk.text.strip('"').lower())
        group_cols = [
            c for c in schema_cols
            if c.lower() != col_lower and c.lower() not in agg_refs
        ]
        parts = [f'"{c}"' for c in group_cols]
        single = len(aggs) == 1
        for lit, vname in vals:
            for expr, alias in aggs:
                out_name = vname if single else f"{vname}_{alias}"
                parts.append(
                    f'COALESCE({expr} FILTER (WHERE ({col_text}) = '
                    f'({lit})), ({default_sql})) AS "{out_name}"'
                )
        gb = (
            " GROUP BY " + ", ".join(f'"{c}"' for c in group_cols)
            if group_cols else ""
        )
        repl = f"(SELECT {', '.join(parts)} FROM {src}{gb})"
        toks = toks[:src_lo] + tokenize(repl) + toks[pivot_close + 1:]
