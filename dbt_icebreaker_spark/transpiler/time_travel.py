"""Snowflake time travel — ``FROM t AT(TIMESTAMP => x)`` /
``BEFORE(TIMESTAMP => x)`` over SCD2 snapshot tables.

Plain parquet has no snapshot layer, so general time travel stays
refused (``transforms.detect_time_travel``). But the engine's M4
snapshot materialization (``materializations/snapshot.py``, ref
snapshot.sql:89-111) maintains explicit validity intervals
(``dbt_valid_from`` / ``dbt_valid_to``) — for those tables the
time-travel read IS a predicate:

    AT(TIMESTAMP => x)      dbt_valid_from <= x
                            AND (dbt_valid_to IS NULL OR dbt_valid_to > x)
    BEFORE(TIMESTAMP => x)  dbt_valid_from <  x
                            AND (dbt_valid_to IS NULL OR dbt_valid_to >= x)

(the state at instant x, respectively the state at the instant just
before x — matching Snowflake's inclusive AT / exclusive BEFORE).

This lives at the ENGINE layer (``IcebreakerEngine.execute``), same as
dynamic PIVOT: the rewrite needs the live catalog to check the target
is actually a snapshot table (has the SCD2 meta columns). Non-snapshot
tables and OFFSET/STATEMENT/STREAM forms keep the actionable refusal.

Scale note: the rewrite is a pure predicate — it pushes down to the
parquet scan like any other filter (validity-interval columns are
min/max indexed per row group), adding zero shuffles.
"""

from __future__ import annotations

from .core import TranspileError
from .tokenizer import (
    QIDENT,
    WORD,
    find_matching_paren,
    next_code,
    prev_code,
    render,
    tokenize,
)

_SCD2_COLS = {"dbt_valid_from", "dbt_valid_to"}

# words that can follow the AT/BEFORE group without being an alias —
# clause heads and join keywords (a bare alias is any OTHER word)
_NON_ALIAS_WORDS = frozenset((
    "WHERE", "GROUP", "ORDER", "LIMIT", "JOIN", "LEFT", "RIGHT",
    "FULL", "INNER", "CROSS", "NATURAL", "SEMI", "ANTI", "LATERAL",
    "ON", "USING", "UNION", "EXCEPT", "INTERSECT", "HAVING",
    "QUALIFY", "WINDOW", "FETCH", "OFFSET", "FOR", "ASOF", "PIVOT",
    "UNPIVOT", "SAMPLE", "TABLESAMPLE", "MATCH_RECOGNIZE", "AT",
    "BEFORE",
))


def _find_time_travel(toks):
    """Locate one ``<name> AT|BEFORE ( TIMESTAMP|OFFSET|... => expr )``;
    returns (name_lo, name_hi, kw, kind, expr_text, close_i) else None.
    name_lo..name_hi is the dotted table name token span."""
    n = len(toks)
    for i, t in enumerate(toks):
        if not (t.kind == WORD and t.upper in ("AT", "BEFORE")):
            continue
        j = next_code(toks, i + 1)
        if j >= n or not toks[j].is_op("("):
            continue
        k = next_code(toks, j + 1)
        if k >= n or toks[k].kind != WORD or toks[k].upper not in (
            "TIMESTAMP", "OFFSET", "STATEMENT", "STREAM"
        ):
            continue
        m = next_code(toks, k + 1)
        if m >= n or not toks[m].is_op("=>"):
            continue
        close = find_matching_paren(toks, j)
        expr = render(toks[next_code(toks, m + 1):close]).strip()
        # table name: dotted word/"quoted" run immediately before
        # AT/BEFORE
        p = prev_code(toks, i - 1)
        hi = p + 1
        lo = p
        while lo >= 0 and (
            toks[lo].kind in (WORD, QIDENT) or toks[lo].is_op(".")
        ):
            lo -= 1
        lo += 1
        return (lo, hi, toks[k].upper, t.upper, expr, close)
    return None


def _spark_name(toks_slice) -> str:
    """Render a dotted name span with double-quoted parts converted to
    backticks (usable both in spark.table() and spliced SQL)."""
    parts = []
    for t in toks_slice:
        if t.kind == QIDENT:
            name = t.text[1:-1].replace('""', '"').replace("`", "``")
            parts.append(f"`{name}`")
        elif t.kind == WORD or t.is_op("."):
            parts.append(t.text)
    return "".join(parts)


def _statement_timestamp_expr(engine, expr: str) -> str:
    """``STATEMENT => '<qid>'`` → a TIMESTAMP literal from the
    engine's result history (every executed statement records a
    query id + wall-clock time; round 7).

    DOCUMENTED DEVIATION: the resolved instant is WALL-CLOCK time, as
    is OFFSET's anchor — snapshot batches written with a future/
    back-dated logical ``now`` (a test convenience; production
    run_snapshot uses real time) won't line up with these forms (use
    the explicit TIMESTAMP form there). A statement's own snapshot
    writes are included by AT and excluded by BEFORE only to
    completion-time granularity."""
    import datetime

    if engine is None:
        raise TranspileError(
            "Time-travel STATEMENT => … needs the engine's query "
            "history — run the statement through IcebreakerEngine."
            "execute, not the bare transpiler"
        )
    e = expr.strip()
    if len(e) >= 2 and e[0] == "'" and e[-1] == "'":
        qid = e[1:-1].replace("''", "'")
    else:
        raise TranspileError(
            f"Time-travel STATEMENT => {expr!r}: expected a quoted "
            "query id literal (LAST_QUERY_ID() resolves at statement "
            "level — capture it into a session variable first: "
            "SET qid = LAST_QUERY_ID())"
        )
    try:
        ts = engine.statement_timestamp(qid)
    except ValueError as ve:
        raise TranspileError(str(ve)) from None
    iso = datetime.datetime.fromtimestamp(ts).strftime(
        "%Y-%m-%d %H:%M:%S.%f")
    return f"TIMESTAMP '{iso}'"


def _rewrite_clone_at(toks, engine):
    """``CREATE [OR REPLACE] TABLE t CLONE src AT|BEFORE(…)`` →
    ``CREATE [OR REPLACE] TABLE t AS SELECT * FROM src AT|BEFORE(…)``
    — the AT-read then rewrites onto the snapshot predicate like any
    other time-travel scan (round 7; non-snapshot sources keep the
    actionable refusal). DOCUMENTED DEVIATION: like plain CLONE, this
    materializes a copy (parquet has no zero-copy snapshot layer)."""
    # anchored position: CLONE must be the word immediately after the
    # CREATE TABLE target name — a column/alias literally named
    # `clone` elsewhere in a CTAS must not trigger (r7 review; same
    # anchor transforms.rewrite_clone uses)
    from .transforms import _clone_keyword_pos

    ci = _clone_keyword_pos(toks)
    if ci is None:
        return None
    head = render(toks[:ci]).rstrip()
    tail = render(toks[ci + 1:]).strip()
    import re as _re

    # TRANSIENT is a Snowflake storage class with no Spark meaning
    # (every Spark table is "transient" in that sense) — same strip
    # rewrite_clone applies
    head = _re.sub(r"(?i)\bTRANSIENT\s+", "", head)
    # Spark's V1 catalog has no REPLACE TABLE AS SELECT — lower OR
    # REPLACE to DROP IF EXISTS + CTAS (same as plain CLONE's rewrite)
    m = _re.match(r"(?is)^\s*CREATE\s+OR\s+REPLACE\s+TABLE\s+(.*)$", head)
    if m:
        tbl = m.group(1).strip()
        return tokenize(
            f"DROP TABLE IF EXISTS {tbl}; "
            f"CREATE TABLE {tbl} AS SELECT * FROM {tail}"
        )
    return tokenize(f"{head} AS SELECT * FROM {tail}")


def resolve_time_travel(spark, sql: str, transpiler, engine=None) -> str:
    """Rewrite every snapshot-table ``AT/BEFORE(TIMESTAMP|OFFSET|
    STATEMENT => x)`` in ``sql`` onto the SCD2 validity predicate
    (OFFSET is seconds relative to now; STATEMENT resolves through the
    engine's query history), and ``CREATE TABLE … CLONE src AT(…)``
    onto a point-in-time CTAS. Raises the actionable refusal for
    non-snapshot tables and the STREAM form. SQL without time travel
    returns unchanged (one cheap scan)."""
    import re

    if not re.search(r"\b(AT|BEFORE)\s*\(", sql, re.IGNORECASE):
        return sql
    if re.search(r"\bCHANGES\s*\(\s*INFORMATION\b", sql,
                 re.IGNORECASE):
        # `FROM t CHANGES (INFORMATION => …) AT (…)` is stream change
        # tracking, not time travel — without this check the AT()
        # reached the resolver and blamed a missing table name (r10)
        raise TranspileError(
            "CHANGES (INFORMATION => …) reads a table's change-"
            "tracking delta, which plain parquet tables do not "
            "record. Use Structured Streaming "
            "(streaming.stream_incremental_append) for change "
            "capture."
        )
    toks = tokenize(sql)
    if re.search(r"\bCLONE\b", sql, re.IGNORECASE):
        rewritten = _rewrite_clone_at(toks, engine)
        if rewritten is not None:
            toks = rewritten
        # else: CLONE here is not a CREATE…CLONE statement head (e.g.
        # a column named `clone`) — fall through to the normal
        # AT-read rewrite (r7 review)
    while True:
        hit = _find_time_travel(toks)
        if hit is None:
            return render(toks)
        lo, hi, kw, kind, expr, close = hit
        name = _spark_name(toks[lo:hi])
        if kw == "OFFSET":
            # seconds relative to now (Snowflake: negative = past).
            # Snowflake REJECTS a positive offset (a future instant);
            # silently resolving it to the current state would mask a
            # dropped minus sign (r7 ADVICE). Static literals refuse at
            # transpile time; non-literal exprs get a runtime assert.
            import re as _re

            lit = _re.fullmatch(r"\s*[+-]?\d+(\.\d+)?\s*", expr)
            if lit and float(expr) > 0:
                raise TranspileError(
                    f"Time-travel {kind}(OFFSET => {expr.strip()}) is a "
                    "future instant — Snowflake requires a non-positive "
                    "offset (seconds before now). Did you mean "
                    f"OFFSET => -{expr.strip()}?"
                )
            guard = ("coalesce(cast(assert_true(({e}) <= 0, "
                     "'AT(OFFSET => n): n must be <= 0 — seconds before "
                     "now; positive offsets are future instants') "
                     "as bigint), 0)").format(e=expr)
            expr = (f"TIMESTAMPADD(SECOND, CAST(({expr}) AS BIGINT) "
                    f"+ {guard}, CURRENT_TIMESTAMP())")
        elif kw == "STATEMENT":
            expr = _statement_timestamp_expr(engine, expr)
        elif kw != "TIMESTAMP":
            raise TranspileError(
                f"Time-travel clause {kind}({kw} => …) is not supported "
                "— TIMESTAMP/OFFSET/STATEMENT forms work over snapshot "
                "tables (STREAM needs CDC state). On an Iceberg/Delta "
                "catalog table use Spark's VERSION AS OF instead."
            )
        if not name:
            raise TranspileError(
                f"Time-travel {kind}(TIMESTAMP => …) must follow a "
                "table name in the FROM clause"
            )
        try:
            cols = {c.lower() for c in spark.table(name).columns}
        except Exception:
            cols = set()
        if not _SCD2_COLS <= cols:
            raise TranspileError(
                f"Time-travel clause {kind}(TIMESTAMP => …) on {name}: "
                "plain parquet tables keep no history. Supported only "
                "on snapshot (SCD2) tables carrying dbt_valid_from/"
                "dbt_valid_to (run_snapshot), or use Spark's TIMESTAMP "
                "AS OF on an Iceberg/Delta catalog table "
                "(iceberg.attach_catalog)."
            )
        if kind == "AT":
            pred = (
                f"dbt_valid_from <= ({expr}) AND (dbt_valid_to IS NULL "
                f"OR dbt_valid_to > ({expr}))"
            )
        else:  # BEFORE: state at the instant just before x
            pred = (
                f"dbt_valid_from < ({expr}) AND (dbt_valid_to IS NULL "
                f"OR dbt_valid_to >= ({expr}))"
            )
        # keep the user's alias if one follows; else alias back to the
        # table's last name part so qualified references keep resolving
        after = next_code(toks, close + 1)
        has_alias = after < len(toks) and (
            toks[after].kind == QIDENT
            or (toks[after].kind == WORD and (
                toks[after].upper == "AS"  # AS <alias> follows — keep
                or toks[after].upper not in _NON_ALIAS_WORDS
            ))
        )
        if has_alias:
            alias = ""
        else:
            # last name-part token (NOT a '.'-split of the rendered
            # text — a quoted name may itself contain dots)
            last = [t for t in toks[lo:hi] if t.kind in (WORD, QIDENT)][-1]
            if last.kind == QIDENT:
                nm = last.text[1:-1].replace('""', '"').replace("`", "``")
                alias = f" `{nm}`"
            else:
                alias = f" {last.text}"
        repl = f"(SELECT * FROM {name} WHERE {pred}){alias} "
        toks = toks[:lo] + tokenize(repl) + toks[close + 1:]
