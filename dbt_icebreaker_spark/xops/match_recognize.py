"""MATCH_RECOGNIZE — row-pattern matching over partitioned, ordered
rows (SQL:2016 §7.9; Snowflake's implementation is the parity target).

Spark has no native row-pattern operator, so this is the brief's
(b)-tier custom operator: DEFINE predicates are evaluated as ordinary
JVM window/boolean expressions (PREV/NEXT lower to LAG/LEAD — nothing
row-at-a-time in the hot path), and only the pattern AUTOMATON runs in
Python, one `applyInPandas` pass per partition over compact boolean
vectors.

Supported subset (the overwhelmingly common shape; everything else
refuses actionably at parse time):

- ``PARTITION BY`` / ``ORDER BY`` — required (unpartitioned matching
  is a single-task sequential scan by definition; refuse).
- ``MEASURES``: FIRST/LAST/MIN/MAX/SUM/AVG/COUNT over ``col`` or
  ``Sym.col``, COUNT(*) / COUNT(Sym.*), MATCH_NUMBER(), CLASSIFIER();
  bare ``col`` means LAST(col) (ONE ROW PER MATCH semantics).
- ``ONE ROW PER MATCH`` (default) and ``ALL ROWS PER MATCH`` with
  SQL:2016 RUNNING measure semantics (incremental accumulators, O(1)
  per row; CLASSIFIER() = the row's own symbol), plus ``WITH
  UNMATCHED ROWS`` (rows in no match emit with NULL measures). The
  empty-match modifiers (OMIT/SHOW EMPTY MATCHES) refuse. Round 8:
  ``{- … -}`` exclusions — rows inside the exclusion MATCH (consumed;
  running measures and navigation see them; they count as covered for
  WITH UNMATCHED ROWS) but are suppressed from ALL ROWS PER MATCH
  output. In the VM this is an emit-flag on the contained flat terms,
  not a matcher change; exclusions cannot be quantified.
- ``AFTER MATCH SKIP PAST LAST ROW`` (default), ``SKIP TO NEXT ROW``,
  and ``SKIP TO [FIRST|LAST] <symbol>`` (resume AT the symbol's
  first/last row — overlapping matches; SQL:2016 runtime errors when
  the symbol matched no row or the target would loop).
- ``PATTERN``: sequences of symbols with greedy quantifiers
  (``A B+ C* D? E{2} F{1,3}``) and reluctant suffixes (``B+?`` /
  ``B{1,3}?`` — fewest repetitions, round 7: the VM split prefers
  the exit branch), top-level alternation (``A B+ | C D``)
  with SQL:2016 §7.9 preferment order, and — round 6 — quantified
  GROUPS ``(A B)+`` / ``(A B){n,m}`` with in-group alternation
  ``(A|B)``. Patterns compile to a small backtracking-VM program
  (char/split/jmp/mark/loopchk — regex-engine style) run ITERATIVELY
  with an explicit choice stack (no recursion — a 50k-row group match
  is fine), a visited-state set (overlapping alternation stays
  polynomial), and the standard empty-loop check (a required
  repetition may legitimately match empty; only the LOOP is cut).
  Round 7: partition anchors ``^ $`` (zero-width position guards in
  the VM) and ``PERMUTE(a, b, …)`` (compiled to the alternation of
  the k! orderings in lexicographic preferment order, k ≤ 6 — the
  parsed argument nodes are SHARED across orderings so flag columns
  don't multiply).
- ``DEFINE Sym AS <boolean over current row / PREV(col[,n]) /
  NEXT(col[,n])>``; symbols not defined always match (SQL:2016
  "universal row pattern variable").

Scale notes: per-partition rows must fit one Arrow batch (the same
contract as every sessionization operator — Flink CEP distributes the
same way); the matcher is the compiled backtracking VM above —
O(program × rows) states per start position via the visited set —
and emits one row per match
— output ≪ input. The boolean evaluation stays whole-stage-codegen
JVM work; Python sees only (order keys, K boolean flags, measure
source columns).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructField, StructType


@dataclass
class PatternTerm:
    symbol: str
    min_n: int
    max_n: Optional[int]  # None = unbounded
    alt: int = 0  # top-level alternative this term belongs to (A B | C)
    # {- … -} exclusion (SQL:2016 §7.9): the row is consumed by the
    # match (navigation/measures see it) but suppressed from ALL ROWS
    # PER MATCH output — an emit flag, not a matcher change (round 8)
    excluded: bool = False


@dataclass
class Measure:
    name: str
    fn: str        # first/last/min/max/sum/avg/count/match_number/classifier
    symbol: Optional[str]  # restrict to rows matched as this symbol
    col: Optional[str]     # None for COUNT(*) / MATCH_NUMBER / CLASSIFIER
    # FINAL semantics under ALL ROWS PER MATCH (r10): the measure's
    # value on EVERY row of a match is the match's final value. The
    # matcher back-fills it when the match completes — the running
    # value on the last row IS the final value, so no second pass, no
    # post-operator window, no extra shuffle.
    final: bool = False


@dataclass
class MatchRecognizeSpec:
    partition_by: list[str]
    order_by: list[str]
    measures: list[Measure]
    pattern: list[PatternTerm]
    defines: dict[str, str]  # symbol -> Snowflake-dialect boolean SQL
    skip_to_next_row: bool = False
    all_rows: bool = False  # ALL ROWS PER MATCH (RUNNING aggregates)
    with_unmatched: bool = False  # WITH UNMATCHED ROWS (NULL measures)
    # ALL ROWS PER MATCH OMIT EMPTY MATCHES (r10): zero-width matches
    # are numbered but emit no row; default (SHOW EMPTY MATCHES) emits
    # the starting row with COUNT()=0 / NULL aggregates / NULL
    # CLASSIFIER(), per SQL:2016 §7.9 and Snowflake
    omit_empty: bool = False
    # match-state aggregate conjuncts in DEFINE (r10): per symbol, a
    # list of descriptors evaluated DURING matching — ("count", cmp,
    # n) for COUNT(*) bounds, ("first", col, cmp, fcol, arith, lit)
    # for FIRST-relative comparisons. Both are pure functions of
    # (row, match_start), so the VM's memoization stays valid; static
    # conjuncts stay on the precomputed-flag fast path.
    dyn_defines: Optional[dict] = None
    skip_to_symbol: Optional[str] = None  # AFTER MATCH SKIP TO [F|L] sym
    skip_to_first: bool = False  # FIRST vs LAST occurrence of the symbol
    # parse_pattern_full alternative trees (grouped patterns); None →
    # derived from the flat terms (paren-free patterns)
    tree: Optional[list] = None
    # round-9 EXPRESSION measures (``LAST(x) - FIRST(x) AS delta``,
    # ``SUM(hi - lo) AS range_sum``): aggregate ARGUMENTS that are
    # expressions become hidden input columns computed BEFORE matching
    # (name, Snowflake expr SQL — PREV/NEXT allowed, same window
    # rewrite as DEFINE), and expressions OF aggregates become derived
    # output formulas computed AFTER (name, formula over hidden
    # measure names). measure_order preserves the user's declared
    # output column order across the mix.
    input_exprs: Optional[list] = None
    derived: Optional[list] = None
    measure_order: Optional[list] = None


_QUANT_RE = re.compile(
    r"^(?P<sym>[A-Za-z_][A-Za-z0-9_]*)"
    r"(?P<q>[*+?]|\{\s*\d+\s*(,\s*\d*\s*)?\})?$"
)

# pattern-tree nodes (round-6 grouping support):
#   ("sym", term_index, lo, hi)   — a symbol occurrence; term_index
#                                    points into the FLAT terms list
#                                    (whose flags the matcher reads)
#   ("grp", [nodes], lo, hi)      — a quantified group (A B){n,m}
#   ("alt", [[nodes], …])         — alternation inside a group (A|B)
_PTOK_RE = re.compile(
    r"\{-|-\}|[A-Za-z_][A-Za-z0-9_]*|\{\s*\d+\s*(?:,\s*\d*\s*)?\}"
    r"|[()|*+?,^$]"
)


def _read_quant(toks: list[str], i: int):
    """Quantifier at toks[i] (if any) → (lo, hi, lazy, next_index).
    A trailing '?' after any quantifier marks it RELUCTANT (SQL:2016
    §7.9 / regex lazy: match as FEW repetitions as possible; round
    7)."""

    def lazy_suffix(j: int) -> tuple[bool, int]:
        if j < len(toks) and toks[j] == "?":
            return True, j + 1
        return False, j

    if i < len(toks) and toks[i] in ("*", "+", "?"):
        q = toks[i]
        lazy, nxt = lazy_suffix(i + 1)
        return ({"*": 0, "+": 1, "?": 0}[q],
                {"*": None, "+": None, "?": 1}[q], lazy, nxt)
    if i < len(toks) and toks[i].startswith("{") and toks[i] != "{-":
        nums = toks[i].strip("{}").split(",")
        lo = int(nums[0])
        hi = (lo if len(nums) == 1
              else (None if nums[1].strip() == "" else int(nums[1])))
        if hi is not None and hi < lo:
            raise ValueError(
                f"MATCH_RECOGNIZE PATTERN: bad quantifier {toks[i]!r}"
            )
        lazy, nxt = lazy_suffix(i + 1)
        return lo, hi, lazy, nxt
    return 1, 1, False, i


def parse_pattern_full(text: str):
    """Parse a PATTERN into (flat terms, top-level alternative trees).

    Grammar (SQL:2016 §7.9 subset): ``alt := seq ('|' seq)*``,
    ``seq := item+``, ``item := (symbol | '(' alt ')') quant?`` —
    quantified GROUPS ``(A B)+`` and in-group alternation ``(A|B)``
    (round 6), partition anchors ``^ $``, ``PERMUTE(a, b, …)``
    (k ≤ 6), and reluctant quantifier suffixes (``B+?`` — match as
    few repetitions as possible; round 7). The flat terms list
    holds one entry per SYMBOL
    OCCURRENCE in written order — the flag table and measure/skip
    consumers key on it; tree sym nodes index into it."""
    text = text.strip()
    if not text:
        raise ValueError("MATCH_RECOGNIZE PATTERN: empty pattern")
    toks = _PTOK_RE.findall(text)
    if re.sub(r"\s+", "", "".join(toks)) != re.sub(r"\s+", "", text):
        bad = re.sub(r"\s+", "", text)
        for tk in toks:
            bad = bad.replace(tk.replace(" ", ""), "", 1)
        raise ValueError(
            f"MATCH_RECOGNIZE PATTERN: cannot parse near {bad[:20]!r}"
        )
    terms: list[PatternTerm] = []
    pos = 0
    cur_alt = 0

    def parse_alt(i: int):
        branches = []
        seq, i = parse_seq(i)
        branches.append(seq)
        while i < len(toks) and toks[i] == "|":
            seq, i = parse_seq(i + 1)
            branches.append(seq)
        return branches, i

    def parse_seq(i: int):
        nodes = []
        while i < len(toks) and toks[i] not in ("|", ")", ",", "-}"):
            tk = toks[i]
            if tk == "{-":
                # {- pattern -} exclusion (SQL:2016 §7.9): rows match
                # (consumed; measures/navigation see them) but are
                # suppressed from ALL ROWS PER MATCH output. Compiles
                # as an unquantified group; the contained flat terms
                # carry an emit flag the output loop reads (round 8).
                t0 = len(terms)
                branches, i = parse_alt(i + 1)
                if i >= len(toks) or toks[i] != "-}":
                    raise ValueError(
                        "MATCH_RECOGNIZE PATTERN: unclosed {- exclusion"
                    )
                i += 1
                if i < len(toks) and (
                    toks[i] in ("*", "+", "?") or toks[i].startswith("{")
                ) and toks[i] not in ("{-",):
                    raise ValueError(
                        "MATCH_RECOGNIZE PATTERN: a {- -} exclusion "
                        "cannot be quantified (SQL:2016 §7.9) — "
                        "quantify the symbols inside it"
                    )
                for t2 in terms[t0:]:
                    t2.excluded = True
                inner = (branches[0] if len(branches) == 1
                         else [("alt", branches)])
                nodes.append(("grp", inner, 1, 1, False))
            elif tk == "^":
                # partition-start anchor: a zero-width position guard
                nodes.append(("anch", "bol"))
                i += 1
            elif tk == "$":
                # partition-end anchor
                nodes.append(("anch", "eol"))
                i += 1
            elif tk == "(":
                branches, i = parse_alt(i + 1)
                if i >= len(toks) or toks[i] != ")":
                    raise ValueError(
                        "MATCH_RECOGNIZE PATTERN: unclosed group"
                    )
                lo, hi, lazy, i = _read_quant(toks, i + 1)
                inner = (branches[0] if len(branches) == 1
                         else [("alt", branches)])
                nodes.append(("grp", inner, lo, hi, lazy))
            elif tk.upper() == "PERMUTE":
                # PERMUTE(a, b, …) ≡ alternation of the k! orderings
                # in lexicographic (written) order — SQL:2016 §7.9
                # preferment. Each argument's nodes are parsed ONCE and
                # shared across orderings (same flat term indices →
                # same flag columns; measures key on symbols).
                import itertools

                if i + 1 >= len(toks) or toks[i + 1] != "(":
                    raise ValueError(
                        "MATCH_RECOGNIZE PATTERN: PERMUTE needs an "
                        "argument list — PERMUTE(A, B[, …])"
                    )
                i += 2
                p_args = []
                while True:
                    seq, i = parse_seq(i)
                    p_args.append(seq)
                    if i < len(toks) and toks[i] == ",":
                        i += 1
                        continue
                    break
                if i >= len(toks) or toks[i] != ")":
                    raise ValueError(
                        "MATCH_RECOGNIZE PATTERN: unclosed PERMUTE"
                    )
                if len(p_args) > 6:
                    raise ValueError(
                        f"MATCH_RECOGNIZE PATTERN: PERMUTE of "
                        f"{len(p_args)} elements expands to "
                        f"{len(p_args)}! orderings — the cap is 6 "
                        "(720); split the pattern"
                    )
                lo, hi, lazy, i = _read_quant(toks, i + 1)
                branches = [
                    [nd for part in perm for nd in part]
                    for perm in itertools.permutations(p_args)
                ]
                inner = (branches[0] if len(branches) == 1
                         else [("alt", branches)])
                nodes.append(("grp", inner, lo, hi, lazy))
            elif _QUANT_RE.match(tk) and tk not in ("*", "+", "?"):
                lo, hi, lazy, i2 = _read_quant(toks, i + 1)
                terms.append(PatternTerm(tk.upper(), lo, hi, alt=cur_alt))
                nodes.append(("sym", len(terms) - 1, lo, hi, lazy))
                i = i2
            else:
                raise ValueError(
                    f"MATCH_RECOGNIZE PATTERN: cannot parse term {tk!r}"
                )
        if not nodes:
            raise ValueError(
                "MATCH_RECOGNIZE PATTERN: empty sequence/branch"
            )
        return nodes, i

    # top-level alternatives keep their written-order ids (preferment
    # + the zero-width fallthrough the flat matcher always had)
    alts: list[list] = []
    i = pos
    while True:
        cur_alt = len(alts)
        seq, i = parse_seq(i)
        alts.append(seq)
        if i < len(toks) and toks[i] == "|":
            i += 1
            continue
        break
    if i < len(toks):
        raise ValueError(
            f"MATCH_RECOGNIZE PATTERN: unexpected {toks[i]!r}"
        )
    return terms, alts


def parse_pattern(text: str) -> list[PatternTerm]:
    """Back-compat wrapper: flat terms only. A grouped pattern would
    silently lose its group quantifiers here, so it raises — use
    parse_pattern_full and pass the tree on the spec."""
    terms, tree = parse_pattern_full(text)

    def has_struct(nodes):
        return any(nd[0] in ("grp", "alt", "anch") or
                   (nd[0] == "grp" and has_struct(nd[1])) for nd in nodes)

    if any(has_struct(nodes) for nodes in tree):
        raise ValueError(
            "MATCH_RECOGNIZE PATTERN: grouped patterns need "
            "parse_pattern_full (set MatchRecognizeSpec.tree) — the "
            "flat term list alone cannot carry group quantifiers"
        )
    return terms


def _alt_spans(terms: list[PatternTerm]) -> list[tuple[int, int]]:
    """Contiguous [lo, hi) spans of the flat term list, one per
    top-level alternative, in written (preferment) order."""
    spans: list[list[int]] = []
    prev = None
    for idx, t in enumerate(terms):
        if t.alt != prev:
            spans.append([idx, idx + 1])
            prev = t.alt
        else:
            spans[-1][1] = idx + 1
    return [(lo, hi) for lo, hi in spans]


def _tree_from_terms(terms: list[PatternTerm]) -> list[list]:
    """Paren-free tree: one sequence of sym nodes per top-level
    alternative span (the flat matcher's historical shape)."""
    return [
        [("sym", k, terms[k].min_n, terms[k].max_n)
         for k in range(lo, hi)]
        for lo, hi in _alt_spans(terms)
    ]


def _compile_program(nodes) -> tuple[list, int]:
    """Compile one alternative's node sequence to a backtracking-VM
    program (regex-engine style). Instructions:

    - ``("char", ti)``       consume one row where flags[ti] holds
    - ``("split", a, b)``    try pc=a first (greedy/preferment), b on
                             backtrack
    - ``("jmp", t)``
    - ``("mark", s)``        regs[s] = current pos (loop-entry marker)
    - ``("loopchk", s, L, E)`` pos advanced since mark → loop to L,
                             else exit to E (regex empty-loop check —
                             a legitimately-empty required repetition
                             still matches, only the LOOP is cut)
    - ``("match",)``

    Returns (program, number of marker slots)."""
    prog: list = []
    slots = [0]

    def emit(op):
        prog.append(op)
        return len(prog) - 1

    def compile_nodes(seq):
        for node in seq:
            kind = node[0]
            if kind == "sym":
                ti, lo, hi = node[1], node[2], node[3]
                lazy = node[4] if len(node) > 4 else False
                for _ in range(lo):
                    emit(("char", ti))
                if hi is None:
                    lpc = emit(("split", None, None))
                    emit(("char", ti))
                    emit(("jmp", lpc))
                    # lazy: prefer the EXIT branch (fewest repetitions)
                    prog[lpc] = (("split", len(prog), lpc + 1) if lazy
                                 else ("split", lpc + 1, len(prog)))
                else:
                    fixes = []
                    for _ in range(hi - lo):
                        fixes.append(emit(("split", None, None)))
                        emit(("char", ti))
                    for spc in fixes:
                        prog[spc] = (("split", len(prog), spc + 1) if lazy
                                     else ("split", spc + 1, len(prog)))
            elif kind == "grp":
                children, lo, hi = node[1], node[2], node[3]
                lazy = node[4] if len(node) > 4 else False
                for _ in range(lo):
                    compile_nodes(children)
                if hi is None:
                    s = slots[0]
                    slots[0] += 1
                    lpc = emit(("split", None, None))
                    emit(("mark", s))
                    compile_nodes(children)
                    cpc = emit(("loopchk", s, None, None))
                    # loop back to the SPLIT so each iteration pushes
                    # its own exit choice (per-iteration backtrack
                    # points); lazy prefers the exit branch
                    prog[lpc] = (("split", len(prog), lpc + 1) if lazy
                                 else ("split", lpc + 1, len(prog)))
                    prog[cpc] = ("loopchk", s, lpc, len(prog))
                else:
                    fixes = []
                    for _ in range(hi - lo):
                        fixes.append(emit(("split", None, None)))
                        compile_nodes(children)
                    for spc in fixes:
                        prog[spc] = (("split", len(prog), spc + 1) if lazy
                                     else ("split", spc + 1, len(prog)))
            elif kind == "anch":
                emit((node[1],))  # ("bol",) / ("eol",) position guard
            else:  # ("alt", branches) — written-order preferment
                branches = node[1]
                jmps = []
                for bi, br in enumerate(branches):
                    if bi < len(branches) - 1:
                        spc = emit(("split", None, None))
                        compile_nodes(br)
                        jmps.append(emit(("jmp", None)))
                        prog[spc] = ("split", spc + 1, len(prog))
                    else:
                        compile_nodes(br)
                end = len(prog)
                for jpc in jmps:
                    prog[jpc] = ("jmp", end)

    compile_nodes(nodes)
    emit(("match",))
    return prog, slots[0]


def _vm_match(flags, prog, nslots, start, n, dyn=None, touched=None):
    """Iterative backtracking over a compiled program: an explicit
    choice stack (no Python recursion — depth 0 regardless of match
    length), a consumed-row trail materialized only on success, and a
    visited-state set. A revisited (pc, pos, regs) state on a search
    that has not yet succeeded can only repeat a failing subtree, so
    it fails fast — overlapping in-group alternation stays polynomial
    instead of exponential.

    ``touched`` (optional one-element list) is set True when any
    search path fails a ``char`` only because it ran out of rows at
    ``n`` — streaming callers use it to tell a final failure (every
    path died on a mature row whose flag can never change) from an
    undecided one (some path could be cured by rows past ``n``)."""
    stack: list = []   # (pc, pos, trail_len, regs)
    trail: list = []   # flat term index per consumed row
    regs = (-1,) * nslots
    seen: set = set()
    pc, pos = 0, start
    # without marker slots regs never changes — encode the visited
    # state as one int (pc*(n+1)+pos) instead of a 3-tuple: int
    # hashing is ~3x cheaper and this set add/test runs once per VM
    # op, the hottest line of the matcher (r14)
    stride = n + 1 if nslots == 0 else 0
    while True:
        state = pc * stride + pos if stride else (pc, pos, regs)
        if state in seen:
            op = None  # force backtrack
        else:
            seen.add(state)
            op = prog[pc]
        if op is not None:
            kind = op[0]
            if kind == "char":
                ti = op[1]
                if pos < n and flags[ti][pos] and (
                    dyn is None or dyn[ti] is None or dyn[ti](pos, start)
                ):
                    trail.append(ti)
                    pos += 1
                    pc += 1
                    continue
                if pos >= n and touched is not None:
                    touched[0] = True
            elif kind == "bol":
                # ^ — zero-width partition-start guard
                if pos == 0:
                    pc += 1
                    continue
            elif kind == "eol":
                # $ — zero-width partition-end guard
                if pos == n:
                    pc += 1
                    continue
            elif kind == "split":
                stack.append((op[2], pos, len(trail), regs))
                pc = op[1]
                continue
            elif kind == "jmp":
                pc = op[1]
                continue
            elif kind == "mark":
                r = list(regs)
                r[op[1]] = pos
                regs = tuple(r)
                pc += 1
                continue
            elif kind == "loopchk":
                pc = op[2] if pos > regs[op[1]] else op[3]
                continue
            else:  # match
                return pos, trail[:]
        # backtrack
        if not stack:
            return None
        pc, pos, tl, regs = stack.pop()
        del trail[tl:]


def _match_at(flags: list, terms: list[PatternTerm], start: int, n: int,
              progs: Optional[list] = None, dyn=None, touched=None):
    """Greedy backtracking match beginning at row `start`. Top-level
    alternatives try in written order (SQL:2016 preferment) — the
    first alternative that matches wins, even when a later one would
    match more rows. flags[k][i] = row i satisfies flat term k.
    Returns (end_exclusive, assignment list of flat term indices per
    row) or None. ``progs`` are precompiled per-alternative programs
    (derived from the flat terms when absent). ``touched`` propagates
    the boundary flag from ``_vm_match`` across every alternative."""
    if progs is None:
        progs = [
            _compile_program(nodes) for nodes in _tree_from_terms(terms)
        ]
    empty_hit = None
    for prog, nslots in progs:
        hit = _vm_match(flags, prog, nslots, start, n, dyn, touched)
        if hit is not None:
            if hit[0] > start:
                return hit
            if empty_hit is None:
                # zero-width match: remember it, but let a later
                # alternative try to consume rows first (a bare
                # leftmost-preferment would make `(A* | B)`'s B
                # unreachable); returned only if nothing consumes —
                # the EMPTY match the caller shows/omits per SQL:2016
                empty_hit = hit
    return empty_hit


def _first_symbols(progs) -> Optional[tuple]:
    """Static first-set of a compiled program list, found by walking
    every zero-consumption path from pc 0. Returns ``(tis, bol_start)``:

    - ``tis`` — term indices whose ``char`` can consume the FIRST row
      of a match on a path that does NOT cross a ``^`` anchor (those
      paths can start a match at any position where the flag holds);
    - ``bol_start`` — True when some path crosses ``^`` before its
      first ``char``: such a path can only start a match at row 0 of
      the partition, so it contributes candidacy at position 0 alone
      (r14 — previously ^-anchored alternatives poisoned the whole
      mask via conservative traversal, probing every flag-true row for
      a pattern that can only ever match at the partition head).

    ``eol`` guards and loop checks are traversed conservatively (both
    targets), so the result can only OVER-approximate candidacy.
    Returns None when some alternative can match zero rows (a reachable
    ``match`` before any ``char``) — then every position is a candidate
    and the caller must skip the mask optimization."""
    tis: set = set()
    bol_start = False
    for prog, _ in progs:
        work = [(0, False)]
        seen: set = set()
        while work:
            pc, anchored = work.pop()
            if (pc, anchored) in seen or pc >= len(prog):
                continue
            seen.add((pc, anchored))
            op = prog[pc]
            kind = op[0]
            if kind == "char":
                if anchored:
                    bol_start = True
                else:
                    tis.add(op[1])
            elif kind == "split":
                work.append((op[1], anchored))
                work.append((op[2], anchored))
            elif kind == "jmp":
                work.append((op[1], anchored))
            elif kind == "bol":
                work.append((pc + 1, True))
            elif kind in ("mark", "eol"):
                work.append((pc + 1, anchored))
            elif kind == "loopchk":
                work.append((op[2], anchored))
                work.append((op[3], anchored))
            else:  # ("match",) reachable without consuming → no mask
                return None
    return tis, bol_start


_AGG_FNS = {"first", "last", "min", "max", "sum", "avg", "count"}

import operator as _op

_DYN_CMP = {
    "<": _op.lt, "<=": _op.le, ">": _op.gt, ">=": _op.ge,
    "=": _op.eq, "==": _op.eq, "!=": _op.ne, "<>": _op.ne,
}
_DYN_ARITH = {"*": _op.mul, "/": _op.truediv, "+": _op.add,
              "-": _op.sub}


def _build_dyn_checks(descs_per_term, pdf):
    """Per flat term: a combined (pos, start) -> bool closure over the
    SORTED partition frame, or None for static-only terms. NULL/NaN
    on either side of a comparison is SQL three-valued not-true."""
    out = []
    for descs in descs_per_term:
        if not descs:
            out.append(None)
            continue
        checks = []
        for d in descs:
            if d[0] == "count":
                cmp_fn, lit = _DYN_CMP[d[1]], d[2]
                checks.append(
                    lambda pos, start, cmp_fn=cmp_fn, lit=lit:
                        cmp_fn(pos - start + 1, lit))
            elif d[0] in ("sum", "avg"):
                # SUM/AVG(col) cmp lit over the consumed range
                # [start, pos], RUNNING-inclusive — consumed-range
                # prefix sums keep the closure (pos, start)-pure, so
                # the VM's memoization stays valid (r11, the x78
                # trick extended to monotone aggregates). SQL
                # semantics: NULLs skipped; all-NULL range → NULL
                # aggregate → comparison not-true.
                import numpy as np

                _, col, cmp, lit = d
                arr = pd.to_numeric(
                    pdf[col], errors="coerce").to_numpy(dtype=float)
                nn = ~np.isnan(arr)
                csum = np.cumsum(np.where(nn, arr, 0.0))
                ccnt = np.cumsum(nn.astype(np.int64))
                cmp_fn = _DYN_CMP[cmp]
                is_avg = d[0] == "avg"

                def chk_sa(pos, start, csum=csum, ccnt=ccnt,
                           cmp_fn=cmp_fn, lit=lit, is_avg=is_avg):
                    s = csum[pos] - (csum[start - 1] if start else 0.0)
                    c = ccnt[pos] - (ccnt[start - 1] if start else 0)
                    if c == 0:
                        return False
                    v = (s / c) if is_avg else s
                    return bool(cmp_fn(v, lit))

                checks.append(chk_sa)
            else:  # ("first", col, cmp, fcol, arith, lit)
                _, col, cmp, fcol, arith, lit = d
                la = pdf[col].to_numpy()
                fa = pdf[fcol].to_numpy()
                cmp_fn = _DYN_CMP[cmp]
                ar = _DYN_ARITH[arith] if arith else None

                def chk(pos, start, la=la, fa=fa, cmp_fn=cmp_fn,
                        ar=ar, lit=lit):
                    lhs, rhs = la[pos], fa[start]
                    if lhs is None or rhs is None:
                        return False
                    if lhs != lhs or rhs != rhs:  # NaN/NaT
                        return False
                    if ar is not None:
                        # the literal is a Python float; Decimal
                        # columns refuse mixed arithmetic (but not
                        # mixed comparison) — normalize through float
                        rhs = ar(float(rhs), lit)
                    return bool(cmp_fn(lhs, rhs))

                checks.append(chk)
        if len(checks) == 1:
            out.append(checks[0])
        else:
            out.append(lambda pos, start, cs=tuple(checks):
                       all(c(pos, start) for c in cs))
    return out


def _isnull(v) -> bool:
    """SQL NULL test over plain Python values extracted via tolist():
    None, float NaN, and pandas NaT all compare unequal to themselves
    or are None."""
    return v is None or v != v


def _eval_measure(
    m: Measure, colvals: dict, lo: int, hi: int,
    assign: list[int], terms: list[PatternTerm], match_no: int,
):
    """Evaluate one measure over match rows [lo, hi). Under ALL ROWS
    PER MATCH the caller passes hi = current_row + 1 and the truncated
    assignment — SQL:2016 RUNNING semantics fall out of the slice
    (CLASSIFIER() becomes the current row's symbol, aggregates run
    over rows so far). ``colvals`` is the per-group dict of plain
    Python lists (one .tolist() per column per group) — per-value
    list indexing is ~10× cheaper than pandas .iloc in the per-match
    hot loop (round 11)."""
    if m.fn == "match_number":
        return match_no
    if m.fn == "classifier":
        return terms[assign[-1]].symbol
    idx = list(range(lo, hi))
    if m.symbol is not None:
        want = [
            k for k, t in enumerate(terms) if t.symbol == m.symbol.upper()
        ]
        idx = [i for i, a in zip(idx, assign) if a in want]
    if m.fn == "count":
        if m.col is None:
            return len(idx)
        vals = colvals[m.col]
        return sum(1 for i in idx if not _isnull(vals[i]))
    if not idx:
        return None
    vals = colvals[m.col]
    if m.fn == "first":
        return vals[idx[0]]
    if m.fn == "last":
        return vals[idx[-1]]
    # SQL aggregates ignore NULLs but return NULL on empty input —
    # (pandas' skipna default instead yields 0 for an all-NaN sum and
    # NaN, a real non-NULL double to Spark, for min/max/mean)
    nn = [vals[i] for i in idx if not _isnull(vals[i])]
    if not nn:
        return None
    if m.fn == "min":
        return min(nn)
    if m.fn == "max":
        return max(nn)
    if m.fn == "sum":
        return sum(nn)
    if m.fn == "avg":
        return float(sum(nn)) / len(nn)
    raise ValueError(f"unsupported measure fn {m.fn}")


class _RunningMeasure:
    """Incremental SQL:2016 RUNNING evaluation for one measure over one
    match: O(1) per row. NULL handling matches _eval_measure (SQL
    aggregates skip NULLs; empty qualifying set → NULL)."""

    def __init__(self, m: Measure, terms: list[PatternTerm]) -> None:
        self.m = m
        self.want = (
            None if m.symbol is None
            else {k for k, t in enumerate(terms) if t.symbol == m.symbol.upper()}
        )
        self.terms = terms
        self.count = 0
        self.acc = None       # min/max/sum accumulator
        self.first = None
        self.last = None
        self.n_nonnull = 0

    def step(self, colvals, i: int, term_idx: int, match_no: int):
        m = self.m
        if m.fn == "match_number":
            return match_no
        if m.fn == "classifier":
            return self.terms[term_idx].symbol
        qualifies = self.want is None or term_idx in self.want
        if qualifies:
            if m.col is None:  # COUNT(*) / COUNT(Sym.*)
                self.count += 1
            else:
                v = colvals[m.col][i]
                if self.first is None and self.n_nonnull == 0 and self.count == 0:
                    self.first = v  # first qualifying ROW's value (may be NULL)
                self.count += 1
                self.last = v
                if v is not None and v == v:  # non-null, non-NaN
                    self.n_nonnull += 1
                    if m.fn == "count":
                        pass
                    elif self.acc is None:
                        self.acc = v
                    elif m.fn == "min":
                        self.acc = min(self.acc, v)
                    elif m.fn == "max":
                        self.acc = max(self.acc, v)
                    elif m.fn in ("sum", "avg"):
                        self.acc = self.acc + v
        if m.fn == "count":
            return self.n_nonnull if m.col is not None else self.count
        if self.count == 0:
            return None  # no qualifying row yet
        if m.fn == "first":
            return self.first
        if m.fn == "last":
            return self.last
        if self.n_nonnull == 0:
            return None
        if m.fn == "avg":
            return float(self.acc) / self.n_nonnull
        return self.acc


def _has_prevnext(expr_text: str) -> bool:
    """True when the expression calls PREV( / NEXT( as a real
    function — token-level, skipping string literals, so a 'PREV('
    INSIDE a literal never counts (r11 advisor: a raw-text regex
    would, silently suppressing the matcher's repartition with no
    window exchange present)."""
    from ..transpiler.tokenizer import STRING, WORD, next_code, tokenize

    toks = tokenize(expr_text)
    for ti, tk in enumerate(toks):
        if tk.kind == STRING:
            continue
        if tk.kind == WORD and tk.upper in ("PREV", "NEXT"):
            nx = next_code(toks, ti + 1)
            if nx < len(toks) and toks[nx].is_op("("):
                return True
    return False


def match_recognize(
    df: DataFrame,
    spec: MatchRecognizeSpec,
    transpiler=None,
) -> DataFrame:
    """Run the pattern over `df`. DEFINE predicates are compiled to
    JVM boolean columns first (PREV/NEXT → LAG/LEAD window calls);
    the Python matcher sees only booleans + measure-source columns."""
    if spec.with_unmatched and not spec.all_rows:
        raise ValueError(
            "WITH UNMATCHED ROWS requires ALL ROWS PER MATCH "
            "(SQL:2016 §7.9; ONE ROW PER MATCH has no row to emit)"
        )
    symbols = [t.symbol for t in spec.pattern]
    part = ", ".join(spec.partition_by)
    # NULLS LAST pinned explicitly (Snowflake NULLS-highest) so the
    # flag-computation order matches the matcher's na_position='last'
    # walk even on the direct API path where no transpiler rewrites
    # the window spec
    order = ", ".join(f"{c} NULLS LAST" for c in spec.order_by)
    over = f"OVER (PARTITION BY {part} ORDER BY {order})"

    def _compile_sf_expr(sql_text: str) -> str:
        """Snowflake expr → Spark SQL: PREV/NEXT → LAG/LEAD with the
        partition window appended, then the dialect transpile — shared
        by DEFINE conditions and expression-measure input columns.
        TOKEN-level (r12): the previous raw-text regex rewrote
        'PREV(' INSIDE string literals and its paren walk counted
        parens inside literals — a DEFINE comparing against such a
        literal compiled to garbage SQL."""
        from ..transpiler.tokenizer import (
            WORD, find_matching_paren, next_code, render, tokenize,
        )

        toks = tokenize(sql_text)
        out = []
        i = 0
        n = len(toks)
        while i < n:
            tk = toks[i]
            if tk.kind == WORD and tk.upper in ("PREV", "NEXT"):
                op_i = next_code(toks, i + 1)
                if op_i < n and toks[op_i].is_op("("):
                    close = find_matching_paren(toks, op_i)
                    fn = "LAG" if tk.upper == "PREV" else "LEAD"
                    inner = render(toks[op_i + 1:close]).strip()
                    out.append(f"{fn}({inner}) {over}")
                    i = close + 1
                    continue
            out.append(tk.text)
            i += 1
        sql2 = "".join(out)
        if transpiler is not None:
            wrapped = transpiler.to_spark(f"SELECT {sql2} AS __mr_c0x")
            sql2 = (
                wrapped.split("SELECT", 1)[1]
                .rsplit("AS __mr_c0x", 1)[0]
                .strip()
            )
        return sql2

    work = df
    # expression-measure input columns first: computed per input row,
    # BEFORE matching, so aggregates see them like any data column.
    # made_window tracks whether any compiled expression carries an
    # OVER (PARTITION BY pk …) — that window's exchange already
    # co-locates every partition key, making a second repartition for
    # the matcher redundant (projections preserve partitioning).
    # Detection is TOKEN-level via module-level _has_prevnext,
    # skipping string literals: a raw-text regex would match 'PREV('
    # INSIDE a literal and silently suppress the repartition with no
    # window exchange present (r11 advisor).
    made_window = False
    for in_name, in_expr in (spec.input_exprs or []):
        made_window = made_window or _has_prevnext(in_expr)
        work = work.withColumn(in_name, F.expr(_compile_sf_expr(in_expr)))
    flag_cols = []
    for k, t in enumerate(spec.pattern):
        cond = spec.defines.get(t.symbol)
        name = f"__mr_f{k}"
        flag_cols.append(name)
        if cond is None:
            work = work.withColumn(name, F.lit(True))
            continue
        made_window = made_window or _has_prevnext(cond)
        cond_sql = _compile_sf_expr(cond)
        work = work.withColumn(name, F.expr(f"COALESCE({cond_sql}, FALSE)"))

    in_fields = {f.name: f for f in work.schema.fields}
    if spec.all_rows:
        # Spark column resolution is case-insensitive; compare folded,
        # and only against the ORIGINAL input columns (not the
        # internal __mr_f* flag columns)
        data_lower = {f.name.lower() for f in df.schema.fields}
        dup = [m.name for m in spec.measures if m.name.lower() in data_lower]
        dup += [n for n, _ in (spec.derived or [])
                if n.lower() in data_lower]
        if dup:
            raise ValueError(
                f"ALL ROWS PER MATCH: measure name(s) {dup} collide "
                "with input columns — alias the measures differently"
            )
        # ALL ROWS PER MATCH: every input column of each matched row,
        # then the (running) measures
        data_cols = [
            f.name for f in df.schema.fields  # original columns only
        ]
        out_fields = [in_fields[c] for c in data_cols]
    else:
        data_cols = list(spec.partition_by)
        out_fields = [in_fields[c] for c in data_cols]
    for m in spec.measures:
        if m.fn in ("count", "match_number"):
            typ = "long"
        elif m.fn == "classifier":
            typ = "string"
        elif m.fn == "avg":
            typ = "double"
        else:
            typ = in_fields[m.col].dataType.simpleString()
            if m.fn == "sum":
                # SUM widens like SQL: int family → long, float →
                # double (pandas computes int64 anyway; a declared
                # 32-bit field would fail the Arrow safe-cast)
                if typ in ("tinyint", "smallint", "int", "bigint"):
                    typ = "long"
                elif typ in ("float", "double"):
                    typ = "double"
        out_fields.append(
            StructField(m.name, _parse_type(typ), True)
        )
    out_schema = StructType(out_fields)
    terms = spec.pattern
    dyn_map = {}
    if spec.dyn_defines:
        # resolve descriptor column names against the input schema
        # (Spark resolution is case-insensitive; pandas is not)
        by_lower = {f.name.lower(): f.name for f in df.schema.fields}

        def _resolve(sym, c):
            actual = by_lower.get(c.lower())
            if actual is None:
                raise ValueError(
                    f"DEFINE {sym}: column {c!r} (in a match-state "
                    f"aggregate comparison) is not an input column"
                )
            return actual

        for symq, descs in spec.dyn_defines.items():
            rd = []
            for d in descs:
                if d[0] == "first":
                    rd.append(("first", _resolve(symq, d[1]), d[2],
                               _resolve(symq, d[3]), d[4], d[5]))
                else:
                    rd.append(d)
            dyn_map[symq] = rd
    dyn_descs_per_term = [dyn_map.get(t.symbol) for t in terms]
    has_dyn = any(dyn_descs_per_term)
    alts_tree = spec.tree if spec.tree is not None else _tree_from_terms(
        spec.pattern)
    progs = [_compile_program(nodes) for nodes in alts_tree]
    measures = spec.measures
    pk = spec.partition_by
    ob = spec.order_by
    skip_next = spec.skip_to_next_row
    all_rows = spec.all_rows
    with_unmatched = spec.with_unmatched
    omit_empty = spec.omit_empty
    skip_sym = spec.skip_to_symbol.upper() if spec.skip_to_symbol else None
    skip_first = spec.skip_to_first

    def run_core(flags, colvals, n, dyn_checks, cand_pos, cand_mask):
        rows = []
        covered = [False] * n if with_unmatched else None
        match_no = 0
        pos = 0
        ci = 0
        while pos < n:
            # candidate starts: a match cannot begin on a row where no
            # program's first consumable symbol holds (_first_symbols).
            # Two renderings, picked per partition by candidate density
            # (r14): SPARSE candidates arrive as a sorted position list
            # (``cand_pos``) and the scan JUMPS to the next candidate
            # >= pos — O(candidates) pointer walk instead of the old
            # O(rows) per-row test (a ^-anchored pattern probes ONCE
            # per group); DENSE candidates keep the per-row boolean
            # test (``cand_mask``), where pointer bookkeeping costs
            # more than it saves (measured 0.74x at 2/3 density).
            # Both disabled when zero-width matches are possible.
            if cand_pos is not None:
                while ci < len(cand_pos) and cand_pos[ci] < pos:
                    ci += 1
                if ci == len(cand_pos):
                    break
                pos = cand_pos[ci]
            elif cand_mask is not None and not cand_mask[pos]:
                pos += 1
                continue
            hit = _match_at(flags, terms, pos, n, progs, dyn_checks)
            if hit is None:
                pos += 1
                continue
            end, assign = hit
            if end == pos:
                # EMPTY match (SQL:2016 §7.9: a zero-width match is a
                # real match — it consumes a match number even under
                # OMIT EMPTY MATCHES, and matching resumes at the NEXT
                # row regardless of the AFTER MATCH SKIP clause). The
                # shown row is the starting row with COUNT()-family
                # measures 0, other aggregates and CLASSIFIER() NULL.
                match_no += 1
                if not (all_rows and omit_empty):
                    if covered is not None:
                        covered[pos] = True  # empty-match, not unmatched
                    rec = {c: colvals[c][pos] for c in data_cols}
                    for m in measures:
                        if m.fn == "match_number":
                            rec[m.name] = match_no
                        elif m.fn == "count":
                            rec[m.name] = 0
                        else:
                            rec[m.name] = None
                    rows.append(rec)
                pos += 1
                continue
            if covered is not None:
                for i2 in range(pos, end):
                    covered[i2] = True
            match_no += 1
            if all_rows:
                # RUNNING measures via incremental accumulators — one
                # O(1) update per (row, measure), not a re-aggregation
                # of the prefix per row (that made long matches O(k²))
                states = [_RunningMeasure(m, terms) for m in measures]
                match_lo = len(rows)
                finals: dict[str, object] = {}
                for i2 in range(pos, end):
                    rec = {c: colvals[c][i2] for c in data_cols}
                    ti = assign[i2 - pos]
                    for st in states:
                        v = st.step(colvals, i2, ti, match_no)
                        rec[st.m.name] = v
                        if st.m.final:
                            finals[st.m.name] = v
                    # {- -} exclusion: the row was consumed (running
                    # measures above already stepped over it; covered[]
                    # marks it matched, so WITH UNMATCHED ROWS does NOT
                    # resurrect it) but is suppressed from output
                    if not terms[ti].excluded:
                        rows.append(rec)
                if finals:
                    # FINAL measures: the running value after the LAST
                    # step (excluded rows included) is the match's
                    # final value — back-fill it onto every emitted
                    # row of this match (O(match) dict writes; no
                    # second automaton pass, no post-operator window)
                    for rec in rows[match_lo:]:
                        rec.update(finals)
            else:
                rec = {c: colvals[c][pos] for c in data_cols}
                for m in measures:
                    rec[m.name] = _eval_measure(
                        m, colvals, pos, end, assign, terms, match_no
                    )
                rows.append(rec)
            if skip_sym is not None:
                # SQL:2016 SKIP TO [FIRST|LAST] <sym>: resume AT the
                # first/last row mapped to the symbol (overlap allowed)
                sym_rows = [
                    pos + off for off, a in enumerate(assign)
                    if terms[a].symbol == skip_sym
                ]
                if not sym_rows:
                    raise ValueError(
                        f"AFTER MATCH SKIP TO {skip_sym}: the symbol "
                        "matched no row in a match (SQL:2016 runtime "
                        "error) — guard with a quantifier minimum or "
                        "use SKIP PAST LAST ROW"
                    )
                target = sym_rows[0] if skip_first else sym_rows[-1]
                if target == pos:
                    raise ValueError(
                        f"AFTER MATCH SKIP TO {skip_sym}: the skip "
                        "target is the first row of the match — "
                        "matching would loop (SQL:2016 runtime error)"
                    )
                pos = target
            else:
                pos = pos + 1 if skip_next else end
        if covered is not None:
            # WITH UNMATCHED ROWS: every input row in NO match is
            # emitted with NULL measures (SQL:2016 — CLASSIFIER() and
            # MATCH_NUMBER() are NULL for unmatched rows)
            for i2 in range(n):
                if covered[i2]:
                    continue
                rec = {c: colvals[c][i2] for c in data_cols}
                for m in measures:
                    rec[m.name] = None
                rows.append(rec)
        return rows

    # static first-set for the candidate-start positions (None
    # disables the optimization entirely)
    start_info = _first_symbols(progs)

    def run_partition(batches):
        # One Python call per PARTITION, not per group: per-group
        # applyInPandas pays a fixed Arrow/pandas construction cost
        # per key that dominates small-group workloads (measured 2.2s
        # no-op vs 0.6s for 1500 keys × ~70 rows at sf0.1 — round 11).
        # The partition's rows materialize in pandas once; memory is
        # bounded by the shuffle partition size, the same contract as
        # every mapInPandas xop. dropna=False keeps NULL partition
        # keys (SQL groups them together).
        #
        # r13 optimization: ONE global mergesort by (pk, ob) NULLS LAST
        # replaces the per-group sort (groups come out contiguous and
        # internally ordered exactly as the old per-group sort —
        # na_position='last' matches Snowflake's NULLS-highest order
        # the DEFINE flag windows were computed under), column values
        # convert to plain lists once per partition and are sliced per
        # group (pointer copies), and all groups' output rows build ONE
        # pandas DataFrame — the per-group DataFrame chop/sort/finalize
        # overhead was ~half the matcher's CPU at sf0.1.
        chunks = list(batches)
        if not chunks:
            return
        pdf_all = pd.concat(chunks, ignore_index=True)
        if not len(pdf_all):
            return
        pdf_all = pdf_all.sort_values(
            list(pk) + list(ob), kind="mergesort", na_position="last"
        ).reset_index(drop=True)
        need = set(data_cols) | {
            m.col for m in measures if m.col is not None}
        # one tolist() per referenced column per partition: plain-list
        # indexing beats pandas .iloc ~10× in the per-match hot loop
        all_flags = [pdf_all[c].tolist() for c in flag_cols]
        all_cols = {c: pdf_all[c].tolist() for c in need}
        if start_info is not None:
            import numpy as np

            start_tis, bol_start = start_info
            mask_np = np.zeros(len(pdf_all), dtype=bool)
            for ti in sorted(start_tis):
                mask_np |= pdf_all[flag_cols[ti]].to_numpy(dtype=bool)
            # density decides the rendering (see run_core): sparse →
            # sorted position lists, dense → per-row boolean mask
            sparse = bool(mask_np.mean() < 0.3) if len(mask_np) else True
        else:
            mask_np = None
        rows = []
        # .indices on the sorted frame: contiguous ascending position
        # arrays per key, NULL keys included under dropna=False
        for idx in pdf_all.groupby(
            pk, sort=False, dropna=False
        ).indices.values():
            s, e = int(idx[0]), int(idx[-1]) + 1
            flags = [fl[s:e] for fl in all_flags]
            colvals = {c: v[s:e] for c, v in all_cols.items()}
            dyn_checks = (
                _build_dyn_checks(
                    dyn_descs_per_term,
                    pdf_all.iloc[s:e].reset_index(drop=True),
                )
                if has_dyn else None
            )
            cand_pos = cand_mask = None
            if mask_np is not None:
                if sparse:
                    # sorted group-relative candidate positions; a
                    # ^-anchored alternative adds position 0 (the only
                    # row where it can start)
                    cand_pos = np.flatnonzero(mask_np[s:e]).tolist()
                    if bol_start and (not cand_pos or cand_pos[0] != 0):
                        cand_pos.insert(0, 0)
                else:
                    cand_mask = mask_np[s:e].tolist()
                    if bol_start and cand_mask:
                        cand_mask[0] = True
            rows.extend(run_core(flags, colvals, e - s, dyn_checks,
                                 cand_pos, cand_mask))
        if rows:
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

    if not all_rows and not has_dyn:
        # mapInPandas is opaque to Catalyst's column pruning — project
        # to exactly what the matcher reads (guide: pass only the
        # columns the function needs). ONE ROW PER MATCH needs the
        # partition keys, order keys, measure sources and flag columns;
        # input columns that only fed the DEFINE windows (already
        # folded into the flags) stop crossing the Arrow boundary.
        # ALL ROWS mode emits every input column, and the dyn path
        # reads descriptor columns from the raw frame — both keep the
        # full row.
        needed = list(dict.fromkeys(
            [*pk, *ob]
            + [m.col for m in measures if m.col is not None]
            + flag_cols
        ))
        work = work.select(*needed)
    if not made_window:
        # no PREV/NEXT window co-located the keys — shuffle explicitly
        # so every group lands whole in one partition
        work = work.repartition(*pk)
    res = work.mapInPandas(run_partition, schema=out_schema)
    if spec.derived:
        # derived output formulas over the hidden measures (plain
        # JVM projections — F.expr over the operator's output; the
        # formulas were validated Snowflake-dialect at parse time)
        for d_name, d_formula in spec.derived:
            d_sql = d_formula
            if transpiler is not None:
                wrapped = transpiler.to_spark(
                    f"SELECT {d_sql} AS __mr_c0x")
                d_sql = (wrapped.split("SELECT", 1)[1]
                         .rsplit("AS __mr_c0x", 1)[0].strip())
            res = res.select("*", F.expr(d_sql).alias(d_name))
    hidden = [m.name for m in spec.measures
              if m.name.startswith("__mr_e")]
    if hidden:
        res = res.drop(*hidden)
    if spec.measure_order is not None:
        keep = data_cols + list(spec.measure_order)
        res = res.select(*keep)
    return res


def _parse_type(s: str):
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(s)
