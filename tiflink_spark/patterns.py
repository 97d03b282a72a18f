"""Row-pattern matching — a MATCH_RECOGNIZE subset.

The reference's query surface is Flink SQL by delegation
(TiFlinkApp.java:270), which includes MATCH_RECOGNIZE (Flink's CEP
entry point: PARTITION BY … ORDER BY … MEASURES … PATTERN (A B+ C)
DEFINE …). Spark has no MATCH_RECOGNIZE; this module implements the
widely-used subset as a Spark-first two-stage operator:

1. every DEFINE predicate is row-local and evaluates JVM-side as a
   boolean column (whole-stage codegen; zero Python in the predicate
   path);
2. an Arrow-batched ``applyInPandas`` per partition runs a tiny
   backtracking matcher over the boolean matrix — per-partition rows
   only, never a global collect, so the operator scales exactly like
   any keyed aggregation (shuffle on the partition key).

Supported subset (documented, checked):
- PATTERN: a sequence of steps, each a variable or an alternation
  ``"A|B"`` (leftmost preference for measure attribution — which
  alternative labels a row never changes matchability because DEFINEs
  are row-local), with quantifier ``1``, ``?``, ``+``, ``*``,
  ``{n,m}`` or ``{n,}`` — greedy by default, with backtracking
  (``B+ C`` gives back rows when C needs them, Flink's default greedy
  semantics); a trailing ``?`` (``+?``, ``*?``, ``{n,m}?``, ``??``)
  makes the step RELUCTANT — it consumes the fewest rows that let the
  rest of the pattern match (Flink's reluctant quantifiers). A
  pattern that could match zero rows total is rejected (Flink's
  rule).
- DEFINE: predicates over the CURRENT row's columns, plus physical
  offset navigation ``PREV(col[, k])`` / ``NEXT(col[, k])`` (also
  spelled ``PREV(B.price)`` — the qualifier is dropped: matches are
  contiguous runs, so Flink's PREV/NEXT over the match's row sequence
  IS the previous/next row of the ordered partition). In BATCH,
  navigation compiles to JVM-side ``lag``/``lead`` window columns, so
  the predicate path stays whole-stage codegen. In STREAMING (since
  round 10), a nav-bearing DEFINE compiles through the run-state
  grammar instead (so it is restricted to comparison/arithmetic/
  boolean predicates there) and the nav columns are computed by
  pandas shift over the cross-batch pending buffer: a k_prev-row
  context tail is retained before the pending suffix so PREV can
  navigate into already-decided rows, and the last k_next rows of
  each buffer are held back from matching until their forward values
  arrive with the next trigger (the order contract guarantees later
  rows only append). Unbounded lookahead at a true stream edge stays
  held — the same contract as a complete-but-provisional edge match.
  Plus LOGICAL
  run-state navigation ``FIRST(V.col[, k])`` / ``LAST(V.col[, k])``
  (and the unqualified universal forms over the match's own row
  prefix): these need the in-flight match assignment, so a DEFINE
  containing them is compiled — a restricted comparison/arithmetic/
  boolean grammar — and evaluated per candidate row inside the
  matcher against the RUNNING assignment (the current row included,
  so ``LAST(DOWN.price, 1)`` is the previous DOWN row, Flink's
  documented idiom). NULL anywhere in a comparison reads as no-match,
  like SQL WHERE. A run-state variable may not appear in an
  alternation step (row attribution would be circular); unlike
  PREV/NEXT, FIRST/LAST works in BOTH the batch and streaming entry
  points — it only ever looks at the match's own buffered rows, never
  across the trigger boundary. An undefined variable matches every
  row (Flink's rule).
- AFTER MATCH SKIP PAST LAST ROW (the default: matches never
  overlap, single left-to-right pass), SKIP TO NEXT ROW (overlapping
  matches — resume at start+1), SKIP TO FIRST/LAST ``var`` (resume
  at that variable's first/last matched row; a resumption at the
  match's own start row would loop forever and raises, Flink's
  runtime rule, as does skipping to a variable the match never
  bound);
- WITHIN: the matcher itself runs inside the window — a match is the
  greedy assignment over the rows whose order value lies within
  ``within`` of the start row, so batch and drained-stream results
  agree by construction (not a post-filter over the unconstrained
  greedy assignment, which could discard a start whose narrower
  within-bound assignment matches);
- MEASURES: FIRST/LAST column of a variable's rows, COUNT/SUM/MIN/MAX
  over them; plus the partition keys and ``match_seq`` (1-based match
  ordinal within the partition, the MATCH_NUMBER() analog).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

_HOWS = ("first", "last", "count", "sum", "min", "max")

_RANGE_RE = re.compile(r"^\{(\d+),(\d*)\}$")


def _parse_quant(quant: str) -> tuple[int, int | None, bool]:
    """Quantifier string → (lo, hi, greedy); hi=None is unbounded. A
    trailing ``?`` on ?/+/*/{n,m} marks the step reluctant."""
    greedy = True
    if quant != "?" and quant.endswith("?"):
        greedy = False
        quant = quant[:-1]
    if quant == "1":
        return 1, 1, greedy
    if quant == "?":
        return 0, 1, greedy
    if quant == "+":
        return 1, None, greedy
    if quant == "*":
        return 0, None, greedy
    m = _RANGE_RE.match(quant)
    if m:
        lo = int(m.group(1))
        hi = int(m.group(2)) if m.group(2) else None
        if hi is not None and hi < lo:
            raise ValueError(f"quantifier {quant}: max < min")
        if (hi or lo) == 0:
            raise ValueError(f"quantifier {quant}: matches nothing")
        return lo, hi, greedy
    raise ValueError(
        f"unsupported quantifier {quant!r} "
        "(supported: 1 ? + * {n,m} {n,} and reluctant ?? +? *? {n,m}?)"
    )


_SKIP_RE = re.compile(
    r"^\s*(past last row|to next row|to (first|last) ([A-Za-z_]\w*))\s*$",
    re.IGNORECASE,
)


def _parse_skip(after_match: str, pat_vars: list[str]):
    """AFTER MATCH SKIP clause → ('past'|'next'|'first'|'last', var)."""
    m = _SKIP_RE.match(after_match)
    if m is None:
        raise ValueError(
            f"unsupported AFTER MATCH SKIP {after_match!r} (supported: "
            "'past last row', 'to next row', 'to first <var>', "
            "'to last <var>')"
        )
    low = m.group(1).lower()
    if low == "past last row":
        return "past", None
    if low == "to next row":
        return "next", None
    var = m.group(3)
    if var not in pat_vars:
        raise ValueError(f"AFTER MATCH SKIP TO unknown variable {var!r}")
    return m.group(2).lower(), var


def _validate(pattern, define, measures) -> tuple[list[str], list[tuple]]:
    """Shared spec validation for the batch AND streaming entry points
    (one implementation — the two cannot drift). Returns the distinct
    variable names and the parsed steps [(names, lo, hi, greedy)]."""
    if not pattern:
        raise ValueError("pattern must be [(var_or_alternation, quant), ...]")
    steps: list[tuple] = []
    pat_vars: list[str] = []
    for spec, quant in pattern:
        names = tuple(v.strip() for v in spec.split("|"))
        if any(not v for v in names):
            raise ValueError(f"bad pattern variable spec {spec!r}")
        lo, hi, greedy = _parse_quant(quant)
        steps.append((names, lo, hi, greedy))
        for v in names:
            if v not in pat_vars:
                pat_vars.append(v)
    if sum(lo for _, lo, _, _ in steps) == 0:
        raise ValueError("pattern could match zero rows (every step optional)")
    unknown = set(define) - set(pat_vars)
    if unknown:
        raise ValueError(f"DEFINE for variables not in pattern: {sorted(unknown)}")
    for alias, var, field, how in measures:
        if var not in pat_vars:
            raise ValueError(f"measure {alias}: unknown variable {var}")
        if how not in _HOWS:
            raise ValueError(f"measure {alias}: how must be one of {_HOWS}")
        if how != "count" and field is None:
            raise ValueError(f"measure {alias}: {how} needs a field")
    return pat_vars, steps


_NAV_RE = re.compile(
    r"\b(PREV|NEXT)\s*\(\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)?)\s*"
    r"(?:,\s*(\d+)\s*)?\)",
    re.IGNORECASE,
)


def _rewrite_nav(define: dict) -> tuple[dict, dict]:
    """PREV/NEXT calls in DEFINE → physical offset columns.

    Matches are contiguous row runs (every quantifier consumes
    adjacent rows), so Flink's PREV/NEXT over the match's row sequence
    is exactly the previous/next row of the ordered partition — a
    ``lag``/``lead`` window column, computed once JVM-side. Returns
    (rewritten define, {nav_col: (fn, src_col, k)}); a variable
    qualifier (``PREV(B.price)``) is dropped per the contiguity
    argument."""
    nav_cols: dict[str, tuple[str, str, int]] = {}

    def sub(m: re.Match) -> str:
        fn = m.group(1).lower()
        col = m.group(2).split(".")[-1]
        k = int(m.group(3) or 1)
        name = f"__nav_{fn}_{col}_{k}"
        nav_cols[name] = (fn, col, k)
        return name

    out = {
        var: _NAV_RE.sub(sub, pred) if pred is not None else pred
        for var, pred in define.items()
    }
    return out, nav_cols


# -- FIRST/LAST run-state navigation ---------------------------------------

_RUNSTATE_RE = re.compile(
    r"\b(FIRST|LAST)\s*\(\s*([A-Za-z_]\w*)(?:\s*\.\s*([A-Za-z_]\w*))?\s*"
    r"(?:,\s*(\d+)\s*)?\)",
    re.IGNORECASE,
)


def _has_runstate(pred: str | None) -> bool:
    return bool(pred) and _RUNSTATE_RE.search(pred) is not None


def _compile_runstate(pred: str) -> tuple:
    """Compile a DEFINE predicate containing FIRST/LAST run-state
    navigation into a Python code object evaluated per candidate row
    against the in-flight match assignment (SQL/Flink RUNNING
    semantics — the current tentative row is included).

    Supported grammar (the standard's DEFINE comparisons): column
    refs, numeric/string literals, FIRST/LAST(V.col[, k]) and the
    unqualified universal forms, PREV/NEXT (pre-rewritten to physical
    nav columns upstream), + - * / %, comparisons, AND/OR/NOT,
    parentheses. Anything else raises NotImplementedError — a partial
    SQL engine in Python would silently diverge from Spark SQL, so
    the contract is a refusal, not an approximation. NULL (or NaN) in
    any comparison reads as no-match (SQL WHERE three-valued logic).

    Returns (code, referenced_columns) — the column set feeds the
    streaming entry point's carry list."""
    import ast

    navs: list[tuple] = []
    lits: list[str] = []

    def mask_lit(m: re.Match) -> str:
        # Quoted literals are opaque to every rewrite below — a DEFINE
        # like sym = 'BUY AND HOLD' must not have its AND (or '=', or
        # NULL) rewritten. SQL doubles the quote char to escape it.
        raw = m.group(0)
        inner = raw[1:-1]
        inner = inner.replace("''" if raw[0] == "'" else '""', raw[0])
        lits.append(inner)
        return f" __strlit{len(lits) - 1}__ "

    def sub(m: re.Match) -> str:
        kind = m.group(1).lower()
        a, b = m.group(2), m.group(3)
        var, col = (None, a) if b is None else (a, b)
        off = int(m.group(4) or 0)
        navs.append((kind, var, col, off))
        return f"_nav({len(navs) - 1})"

    s = re.sub(r"'(?:[^']|'')*'|\"(?:[^\"]|\"\")*\"", mask_lit, pred)
    s = _RUNSTATE_RE.sub(sub, s)
    s = s.replace("<>", "!=")
    s = re.sub(r"(?<![<>!=])=(?!=)", "==", s)
    s = re.sub(r"\bAND\b", " and ", s, flags=re.I)
    s = re.sub(r"\bOR\b", " or ", s, flags=re.I)
    s = re.sub(r"\bNOT\b", " not ", s, flags=re.I)
    s = re.sub(r"\bNULL\b", " None ", s, flags=re.I)
    # restore literals as Python string constants (repr quotes them)
    s = re.sub(r"__strlit(\d+)__", lambda m: repr(lits[int(m.group(1))]), s)
    try:
        tree = ast.parse(s, mode="eval")
    except SyntaxError as e:
        raise NotImplementedError(
            f"DEFINE with FIRST/LAST supports only comparison/arithmetic/"
            f"boolean predicates; could not compile {pred!r}: {e}"
        ) from None

    cols: set[str] = set()

    class Xform(ast.NodeTransformer):
        def visit_Name(self, node):
            if node.id in ("_nav", "None", "True", "False"):
                return node
            cols.add(node.id)
            return ast.Call(
                func=ast.Name(id="_col", ctx=ast.Load()),
                args=[ast.Constant(node.id)],
                keywords=[],
            )

        def visit_Call(self, node):
            if isinstance(node.func, ast.Name) and node.func.id == "_nav":
                return node
            raise NotImplementedError(
                f"unsupported function call in FIRST/LAST DEFINE: {pred!r}"
            )

        def visit_Compare(self, node):
            self.generic_visit(node)
            ops = {
                ast.Lt: "lt", ast.LtE: "le", ast.Gt: "gt", ast.GtE: "ge",
                ast.Eq: "eq", ast.NotEq: "ne",
            }
            parts, left = [], node.left
            for op, right in zip(node.ops, node.comparators):
                if type(op) not in ops:
                    raise NotImplementedError(f"unsupported comparison in {pred!r}")
                parts.append(
                    ast.Call(
                        func=ast.Name(id="_cmp", ctx=ast.Load()),
                        args=[ast.Constant(ops[type(op)]), left, right],
                        keywords=[],
                    )
                )
                left = right
            return parts[0] if len(parts) == 1 else ast.BoolOp(
                op=ast.And(), values=parts
            )

        def visit_BinOp(self, node):
            self.generic_visit(node)
            ops = {
                ast.Add: "add", ast.Sub: "sub", ast.Mult: "mul",
                ast.Div: "div", ast.Mod: "mod",
            }
            if type(node.op) not in ops:
                raise NotImplementedError(f"unsupported operator in {pred!r}")
            return ast.Call(
                func=ast.Name(id="_arith", ctx=ast.Load()),
                args=[ast.Constant(ops[type(node.op)]), node.left, node.right],
                keywords=[],
            )

        def visit_BoolOp(self, node):
            self.generic_visit(node)
            node.values = [
                ast.Call(func=ast.Name(id="_t", ctx=ast.Load()), args=[v], keywords=[])
                for v in node.values
            ]
            return node

        def visit_UnaryOp(self, node):
            self.generic_visit(node)
            if isinstance(node.op, ast.Not):
                node.operand = ast.Call(
                    func=ast.Name(id="_t", ctx=ast.Load()),
                    args=[node.operand], keywords=[],
                )
                return node
            if isinstance(node.op, ast.USub):
                return node
            raise NotImplementedError(f"unsupported unary operator in {pred!r}")

        def visit_Attribute(self, node):
            raise NotImplementedError(f"unsupported attribute access in {pred!r}")

        def visit_Subscript(self, node):
            raise NotImplementedError(f"unsupported subscript in {pred!r}")

    tree = ast.fix_missing_locations(Xform().visit(tree))
    code = compile(tree, "<match_recognize DEFINE>", "eval")
    return code, navs, sorted(cols)


def _is_null(v) -> bool:
    return v is None or (isinstance(v, float) and v != v)


class _RunStateEval:
    """Per-partition evaluator of one variable's compiled run-state
    predicate. Called by the matcher for each candidate row with the
    running assignment (prior steps' spans + the current step's
    partial run, current row included)."""

    def __init__(self, code, navs, values, flags):
        self._code, self._navs = code, navs
        self._values, self._flags = values, flags
        self._k = self._start = 0
        self._by_var: dict = {}
        # Var-qualified FIRST/LAST(V.col) needs the running assignment
        # (_var_rows per candidate row — O(match length) each). The
        # unqualified forms only read _k/_start, so predicates without a
        # var-qualified nav skip that rebuild entirely (profiled ~20% of
        # the matcher on FIRST(value)-style DEFINEs).
        self._needs_by_var = any(var is not None for _k_, var, _c, _o in navs)

        def _col(name):
            v = self._values[name][self._k]
            return None if _is_null(v) else v

        def _nav(i):
            kind, var, col, off = self._navs[i]
            if var is None:  # universal: the match's own row prefix
                idx = self._k - off if kind == "last" else self._start + off
                if idx < self._start or idx > self._k:
                    return None
            else:
                rows = self._by_var.get(var)
                if not rows or off >= len(rows):
                    return None
                idx = rows[-1 - off] if kind == "last" else rows[off]
            v = self._values[col][idx]
            return None if _is_null(v) else v

        def _cmp(op, a, b):
            if _is_null(a) or _is_null(b):
                return False
            import operator as _op

            return bool(getattr(_op, op)(a, b))

        def _arith(op, a, b):
            if _is_null(a) or _is_null(b):
                return None
            import operator as _op

            fn = {"add": _op.add, "sub": _op.sub, "mul": _op.mul,
                  "div": _op.truediv, "mod": _op.mod}[op]
            return fn(a, b)

        def _t(v):
            return bool(v) if v is not None and not _is_null(v) else False

        self._env = {
            "__builtins__": {},
            "_col": _col, "_nav": _nav, "_cmp": _cmp,
            "_arith": _arith, "_t": _t,
        }
        # Bind the eval-mode code object as a zero-arg function once:
        # each candidate-row evaluation is then a plain call instead of
        # an eval() (which rebuilds the frame/scope machinery per call
        # — ~1µs x one call per candidate row).
        import types

        self._fn = types.FunctionType(code, self._env)

    def __call__(self, k, acc, cur_names, cur_start, mstart) -> bool:
        if self._needs_by_var:
            spans = acc + [(cur_names, cur_start, k + 1)]
            self._by_var = _var_rows(spans, self._flags)
        self._k, self._start = k, mstart
        try:
            return bool(self._fn())
        except (TypeError, ZeroDivisionError):
            return False


def _prepare_runstate(
    define_rw: dict, steps: list[tuple], force: frozenset | set = frozenset()
) -> tuple[dict, set]:
    """Compile every FIRST/LAST-bearing DEFINE (on the PREV/NEXT-
    rewritten text, so nav placeholders read as plain columns) →
    ({var: (code, navs, cols)}, all referenced value columns). A
    run-state variable inside an alternation step is refused: the
    matcher attributes alternation rows by the JVM flag columns, and a
    run-state variable's flag is always-true — attribution would be
    circular. ``force`` names variables that must compile through this
    path even without FIRST/LAST — the streaming entry routes
    PREV/NEXT-bearing DEFINEs here (their physical nav columns are
    computed over the cross-batch buffer in the matcher, where lag/lead
    cannot reach)."""
    rs_compiled = {
        v: _compile_runstate(p)
        for v, p in define_rw.items()
        if _has_runstate(p) or v in force
    }
    for names, _lo, _hi, _greedy in steps:
        if len(names) > 1 and any(v in rs_compiled for v in names):
            raise ValueError(
                "matcher-evaluated navigation (FIRST/LAST run-state, or "
                "streaming PREV/NEXT) on an alternation step is "
                f"unsupported (step {'|'.join(names)})"
            )
    value_cols: set = set()
    for code, navs, cols in rs_compiled.values():
        value_cols.update(cols)
        value_cols.update(c for _, _, c, _ in navs)
    return rs_compiled, value_cols


def _bind_runstate(rs_compiled: dict, value_cols: set, pdf, flags) -> dict:
    """Bind the compiled run-state predicates to one partition's rows."""
    if not rs_compiled:
        return {}
    values = {c: pdf[c].to_numpy() for c in value_cols}
    return {
        v: _RunStateEval(code, navs, values, flags)
        for v, (code, navs, _cols) in rs_compiled.items()
    }


def _flag_columns(
    df: DataFrame,
    pat_vars: list[str],
    define: dict,
    nav_cols: dict,
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    runstate_vars: frozenset | set = frozenset(),
    keep_cols: set | None = None,
) -> DataFrame:
    """Stage 1 (JVM): one boolean column per pattern variable — the
    DEFINE predicates run in whole-stage codegen; NULL reads as
    no-match, like SQL WHERE. Undefined variables match every row
    (Flink's rule). ``define`` arrives PREV/NEXT-pre-rewritten (see
    _rewrite_nav); with partition/order context (batch) the nav
    columns compile to lag/lead, without it (streaming) navigation
    raises — see the module doc. Variables in ``runstate_vars``
    (FIRST/LAST predicates) get an always-true JVM flag — their whole
    predicate evaluates in the matcher against the running
    assignment; ``keep_cols`` (the columns those predicates read,
    nav columns included) survive the final drop."""
    work = df
    if nav_cols:
        if partition_by is None:
            raise NotImplementedError(
                "PREV/NEXT navigation in DEFINE is batch-only: the "
                "streaming path evaluates predicates JVM-side per "
                "micro-batch and cannot see across the trigger "
                "boundary (and re-evaluating in Python would swap SQL "
                "engines mid-operator). Precompute the offset column "
                "upstream or use batch match_recognize."
            )
        from pyspark.sql.window import Window

        w = Window.partitionBy(*partition_by).orderBy(*order_by)
        for name, (fn, col, k) in nav_cols.items():
            off = F.lag(col, k) if fn == "prev" else F.lead(col, k)
            work = work.withColumn(name, off.over(w))
    for var in pat_vars:
        pred = define.get(var)
        if var in runstate_vars:
            col = F.lit(True)
        elif pred is not None:
            col = F.coalesce(F.expr(pred).cast("boolean"), F.lit(False))
        else:
            col = F.lit(True)
        work = work.withColumn(f"__m_{var}", col)
    drop = [c for c in nav_cols if c not in (keep_cols or set())]
    return work.drop(*drop)


def _output_fields(df: DataFrame, partition_by, measures) -> list[StructField]:
    """Partition keys + match_seq + typed measures. SUM widens like SQL
    (integral → BIGINT, fractional → DOUBLE) so a long click-run can
    never overflow a narrow source column."""
    from pyspark.sql.types import (
        ByteType,
        DoubleType,
        FloatType,
        IntegerType,
        ShortType,
    )

    in_fields = {f.name: f for f in df.schema.fields}
    out = [in_fields[c] for c in partition_by]
    out.append(StructField("match_seq", LongType(), False))
    for alias, _var, field, how in measures:
        if how == "count":
            out.append(StructField(alias, LongType(), False))
            continue
        dt = in_fields[field].dataType
        if how == "sum":
            if isinstance(dt, (ByteType, ShortType, IntegerType)):
                dt = LongType()
            elif isinstance(dt, FloatType):
                dt = DoubleType()
        out.append(StructField(alias, dt, True))
    return out


def _runtime_steps(steps: list[tuple], flags: dict, rs_evals=None) -> list[tuple]:
    """Bind each parsed step to its union flag array (alternation: a
    row matches the step when ANY alternative's DEFINE holds) and, for
    run-state variables, to their per-candidate evaluator."""
    import numpy as np

    rt = []
    for names, lo, hi, greedy in steps:
        col = (
            flags[names[0]]
            if len(names) == 1
            else np.logical_or.reduce([flags[v] for v in names])
        )
        rs = (rs_evals or {}).get(names[0]) if len(names) == 1 else None
        rt.append((names, lo, hi, col, greedy, rs))
    return rt


def _attempt(pos: int, si: int, steps: list, n: int, limit: int,
             acc: list | None = None, mstart: int | None = None):
    """Match ``steps[si:]`` at ``pos`` using rows [pos, limit) →
    (spans | None, end, eof_seen). ``acc`` carries the spans assigned
    by earlier steps of THIS attempt and ``mstart`` the match's start
    row — the running assignment FIRST/LAST run-state predicates
    evaluate against (both default for navigation-free patterns).

    ``limit`` is the exclusive row bound for THIS match attempt: ``n``
    normally, or the WITHIN window edge (the first row whose order
    value exceeds start+within). Running the greedy search inside the
    limit — rather than post-filtering an unconstrained assignment —
    is what makes batch WITHIN agree with the drained-stream result:
    both emit the narrower within-bound assignment.

    ``eof_seen`` is True when the exploration was stopped by the edge
    of the DATA (limit == n) while the quantifier could still consume
    or require more rows — the streaming signal that more data could
    change (or create) the match, so a stateful consumer must hold the
    candidate. A stop at a WITHIN edge short of the data (limit < n)
    is final: later rows are ordered past the window and can never
    join this match. Batch callers ignore it (end of data is final
    there).

    Greedy steps try the longest run first and shrink; reluctant steps
    try ``lo`` rows first and grow. The data-edge signal differs with
    the direction: a greedy step that completed a match while its run
    was stopped by the data edge must still report eof (more rows can
    lengthen the preferred assignment), while a RELUCTANT step's
    completed match is final — growth can never improve a
    fewest-rows preference — so its run-edge stop only surfaces on
    failure (more rows could turn the failure into a match)."""
    if acc is None:
        acc = []
    if mstart is None:
        mstart = pos
    if si == len(steps):
        return [], pos, False
    names, lo, hi, col, greedy, rs = steps[si]
    cap = limit if hi is None else min(limit, pos + hi)
    k = pos
    while k < cap and col[k] and (
        rs is None or rs(k, acc, names, pos, mstart)
    ):
        k += 1
    # the run stopped at the data edge while still allowed to grow
    eof_run = k == limit == n and (hi is None or k - pos < hi)
    lo_end = pos + lo
    if lo_end > k:
        return None, pos, eof_run
    ends = range(k, lo_end - 1, -1) if greedy else range(lo_end, k + 1)
    eof_any = eof_run if greedy else False
    for end in ends:
        nxt = acc + ([(names, pos, end)] if end > pos else [])
        rest, rend, eof = _attempt(end, si + 1, steps, n, limit, nxt, mstart)
        eof_any = eof_any or eof
        if rest is not None:
            span = [(names, pos, end)] if end > pos else []
            return span + rest, rend, eof_any
    return None, pos, eof_any or eof_run


def _var_rows(spans, flags) -> dict[str, list[int]]:
    """Match spans → {var: matched row indexes}. Alternation rows are
    attributed to the FIRST alternative whose DEFINE holds (leftmost
    preference — Flink's alternative order). Shared by MEASURES and
    AFTER MATCH SKIP TO, so the two can never disagree about which
    rows a variable owns."""
    by_var: dict[str, list[int]] = {}
    for names, s, e in spans:
        if len(names) == 1:
            by_var.setdefault(names[0], []).extend(range(s, e))
        else:
            for j in range(s, e):
                for v in names:
                    if flags[v][j]:
                        by_var.setdefault(v, []).append(j)
                        break
    return by_var


def _skip_target(skip, start: int, end: int, spans, flags) -> int:
    """Next scan position after a match per the AFTER MATCH SKIP
    policy. Raises on the standard's runtime errors: skipping to the
    match's own start row (infinite loop) and skipping to a variable
    the match never bound."""
    mode, var = skip
    if mode == "past":
        return end
    if mode == "next":
        return start + 1
    rows = _var_rows(spans, flags).get(var)
    if not rows:
        raise ValueError(
            f"AFTER MATCH SKIP TO {mode.upper()} {var}: the match "
            f"bound no rows to {var}"
        )
    tgt = rows[0] if mode == "first" else rows[-1]
    if tgt == start:
        raise ValueError(
            f"AFTER MATCH SKIP TO {mode.upper()} {var} resumes at the "
            "match's own start row and would loop forever"
        )
    return tgt


def _scan(
    steps: list,
    n: int,
    streaming: bool,
    ovals=None,
    within=None,
    max_rows: int | None = None,
    skip=("past", None),
    flags=None,
    start: int = 0,
):
    """Left-to-right non-overlapping scan (AFTER MATCH SKIP PAST LAST
    ROW) → (matches, pending_start). In streaming mode the scan STOPS
    at the first position whose attempt saw end-of-data (even if a
    complete-but-provisional match exists — a greedier assignment may
    materialize with the next batch); ``pending_start`` is where the
    next batch must resume. Batch mode always runs to the end
    (pending_start == n).

    With ``within`` set (and ``ovals``, the first order column's
    values) each attempt runs inside its window limit, so a candidate
    whose window has closed (rows exist past start+within) is decided
    FINALLY here — emitted if it matches inside the window, abandoned
    otherwise — identically in batch and streaming; only a candidate
    whose window is still open at the data edge is held as pending.
    ``max_rows`` is the row-count state bound: a blocked candidate
    buffering more rows than this EVICTS — its held within-bound match
    (if complete on the rows at hand) emits, mirroring the
    window-close rule, and a partial one is abandoned."""
    import numpy as np

    # ``start`` > 0: the leading rows are cross-batch CONTEXT retained
    # only so PREV can navigate before the pending suffix — they were
    # decided in an earlier trigger and must not start a match again.
    matches, i = [], start
    while i < n:
        if within is None:
            limit = n
        else:
            # clamp: ovals may be longer than n when the caller holds a
            # NEXT-navigation tail out of matching (streaming) — the
            # window edge must never re-admit held rows
            limit = min(
                int(np.searchsorted(ovals, ovals[i] + within, side="right")), n
            )
        spans, end, eof = _attempt(i, 0, steps, n, limit)
        if streaming and eof:
            too_big = max_rows is not None and (n - i) > max_rows
            if not too_big:
                return matches, i  # hold as pending
            # evicted: a complete provisional match emits (the same
            # rule the window-close path applies — dropping it would
            # lose a match batch semantics emits)
            if spans is not None:
                matches.append(spans)
                i = _skip_target(skip, i, end, spans, flags)
            else:
                i += 1
            continue
        if spans is None:
            i += 1
            continue
        matches.append(spans)
        i = _skip_target(skip, i, end, spans, flags)
    return matches, n


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    pattern: list[tuple[str, str]],
    define: dict[str, str],
    measures: list[tuple[str, str, str | None, str]],
    within=None,
    after_match: str = "past last row",
) -> DataFrame:
    """One output row per pattern match.

    ``pattern``: [(var_or_alternation, quant)] — var spec is ``"A"``
    or ``"A|B"``; quant in {"1", "?", "+", "*", "{n,m}", "{n,}"},
    optionally reluctant with a trailing "?";
    ``define``: var -> row-local SQL predicate (missing var = always),
    with PREV/NEXT physical navigation (compiled to lag/lead);
    ``measures``: [(alias, var, field_or_None, how)] with how in
    first/last/min/max/sum (field required) or count (field ignored);
    ``within``: Flink's WITHIN — the maximum first→last span of a
    match over the FIRST order_by column (a number for numeric order
    columns, a pandas/numpy timedelta for timestamps); the greedy
    search itself runs inside the window.
    ``after_match``: 'past last row' (default, non-overlapping),
    'to next row', 'to first <var>', 'to last <var>'.
    Output schema: partition keys, ``match_seq`` (long), measures.
    """
    pat_vars, steps = _validate(pattern, define, measures)
    skip = _parse_skip(after_match, pat_vars)
    define_rw, nav_cols = _rewrite_nav(define)
    rs_compiled, rs_value_cols = _prepare_runstate(define_rw, steps)
    # Hash-cluster BEFORE the flag/nav stage: the lag/lead windows and
    # the matcher both need ClusteredDistribution(partition_by), so one
    # explicit exchange serves both (repartitioning after the windows
    # planned a SECOND exchange of the same rows). The partition COUNT
    # is pinned to the parallelism: without it AQE coalesces this
    # exchange by BYTES (~100k rows -> 3 partitions at sf0.1) and the
    # CPU-bound Python matcher then runs on 3 of 32 cores — measured
    # 0.9s of a 1.2s pattern_runstate_first. An explicit count is
    # exempt from AQE coalescing, and at real scale defaultParallelism
    # is the cluster's core count, so this stays scale-adaptive
    # (guide §2.5, §4.1).
    par = df.sparkSession.sparkContext.defaultParallelism
    pre = df.repartition(par, *[F.col(c) for c in partition_by])
    work = _flag_columns(
        pre, pat_vars, define_rw, nav_cols, list(partition_by), list(order_by),
        runstate_vars=set(rs_compiled), keep_cols=rs_value_cols,
    )
    out_fields = _output_fields(df, partition_by, measures)
    out_schema = StructType(out_fields)

    meas = list(measures)
    part_cols = list(partition_by)
    order_cols = list(order_by)

    # ONE Python call per physical partition instead of one per GROUP
    # (guide §4.1/§4.2): groupBy().applyInPandas pays an Arrow batch +
    # pandas-DataFrame construction per partition key (~1500 keys at
    # sf0.1 — most of the operator's wall time once the matcher itself
    # is numpy). Instead, hash-cluster and sort the rows ONCE JVM-side,
    # then mapInPandas walks each partition's contiguous groups via
    # numpy boundary slicing. NULLS LAST on the sort matches the pandas
    # sort_values the per-group form used.
    #
    # (The single exchange above already clustered the rows; only the
    # in-partition sort remains here.)
    sort_cols = [F.col(c).asc_nulls_last() for c in [*part_cols, *order_cols]]
    clustered = work.sortWithinPartitions(*sort_cols)
    cols = [f.name for f in out_fields]

    def run_part(batches):
        # Stream the partition's Arrow batches group by group (groups
        # are contiguous after the JVM-side sort) instead of
        # concatenating the whole physical partition into one pandas
        # frame: with the exchange pinned at defaultParallelism a
        # partition is ~table/cores bytes, and materializing it in one
        # Python worker is a §5 spill/OOM risk at scale. Peak pandas
        # allocation here is bounded by ONE Arrow batch + the largest
        # single GROUP (carried across batch boundaries when a group
        # spans them), not the partition.
        import numpy as np
        import pandas as pd

        def emit(group_chunks, records):
            g = (
                group_chunks[0]
                if len(group_chunks) == 1
                else pd.concat(group_chunks, ignore_index=True)
            )
            g = g.reset_index(drop=True)
            flags = {v: g[f"__m_{v}"].to_numpy() for v in pat_vars}
            rs_evals = _bind_runstate(rs_compiled, rs_value_cols, g, flags)
            rt_steps = _runtime_steps(steps, flags, rs_evals)
            ovals = g[order_cols[0]].to_numpy() if within is not None else None
            matches, _ = _scan(
                rt_steps, len(g), streaming=False, ovals=ovals, within=within,
                skip=skip, flags=flags,
            )
            records.extend(
                _measure_rows(g, matches, part_cols, meas, flags, seq0=0)
            )

        def same_key(a, b):
            return all(
                (pd.isna(x) and pd.isna(y)) or x == y for x, y in zip(a, b)
            )

        carry: list = []  # chunks of the current (possibly unfinished) group
        carry_key = None
        for chunk in batches:
            if len(chunk) == 0:
                continue
            records: list = []
            key = chunk[part_cols]
            prev = key.shift()
            neq = ((key != prev) & ~(key.isna() & prev.isna())).any(axis=1)
            starts = np.flatnonzero(neq.to_numpy())
            starts = starts[starts > 0]  # internal group starts only
            if carry and not same_key(
                tuple(chunk[c].iloc[0] for c in part_cols), carry_key
            ):
                # the carried group ended exactly at the batch boundary
                emit(carry, records)
                carry = []
            bounds = np.concatenate(([0], starts, [len(chunk)]))
            # every segment but the last ends at a boundary — complete
            for s, e in zip(bounds[:-2], bounds[1:-1]):
                seg = chunk.iloc[int(s):int(e)]
                if carry:
                    emit([*carry, seg], records)
                    carry = []
                else:
                    emit([seg], records)
            # trailing segment may continue in the next Arrow batch;
            # copy it so the rest of this batch can be freed
            tail_start = int(bounds[-2])
            carry.append(chunk if tail_start == 0 else chunk.iloc[tail_start:].copy())
            carry_key = tuple(carry[-1][c].iloc[0] for c in part_cols)
            if records:
                yield pd.DataFrame.from_records(records, columns=cols)
        if carry:
            records = []
            emit(carry, records)
            if records:
                yield pd.DataFrame.from_records(records, columns=cols)

    return clustered.mapInPandas(run_part, schema=out_schema)


def _np_reduce(vals, idxs: list, how: str):
    """min/max/sum over ``vals[idxs]`` with pandas' NaN semantics
    (missing values are skipped; an all-missing selection yields NaN
    for min/max and 0 for sum) — but ~100x cheaper than the
    ``pdf.loc[idxs, field].min()`` it replaced: no per-match Series
    construction, no label-based indexing. Object-dtype columns (e.g.
    strings) keep the pandas path — numpy can't reduce them."""
    import numpy as np
    import pandas as pd

    if vals.dtype == object:
        return getattr(pd.Series(vals[idxs]), how)()
    sel = vals[idxs]
    kind = sel.dtype.kind
    if kind in "fmM":  # float / timedelta / datetime — NaN/NaT-aware
        mask = pd.isna(sel)
        if mask.any():
            sel = sel[~mask]
            if sel.size == 0:
                return 0 if how == "sum" else (
                    np.datetime64("NaT") if kind == "M" else float("nan")
                )
    if how == "min":
        return sel.min()
    if how == "max":
        return sel.max()
    return sel.sum()


def _measure_rows(pdf, matches, part_cols, meas, flags, seq0: int) -> list[dict]:
    """One output record per match: partition keys + match_seq +
    MEASURES evaluated over each variable's matched rows. Alternation
    rows are attributed to the FIRST alternative whose DEFINE holds
    (leftmost preference — Flink's alternative order).

    Hot path (guide §4.2): profiled at 17.9s of an 18.4s
    pattern_vshape_prev pass at sf0.1 in its per-match pandas form
    (32k matches x 4 measures of ``.at``/``.loc`` scalar access). Now
    the measure source columns are pulled to numpy ONCE per group and
    every per-match evaluation is positional indexing + a numpy
    reduction."""
    records = []
    if not matches:
        return records
    base = {c: pdf.at[0, c] for c in part_cols}
    vals_by_field = {
        field: pdf[field].to_numpy()
        for _alias, _var, field, how in meas
        if field is not None and how != "count"
    }
    for mi, spans in enumerate(matches, start=1):
        rec = dict(base)
        rec["match_seq"] = seq0 + mi
        by_var = _var_rows(spans, flags)
        for alias, var, field, how in meas:
            idxs = by_var.get(var, [])
            if how == "count":
                rec[alias] = len(idxs)
            elif not idxs:
                rec[alias] = None
            elif how == "first":
                rec[alias] = vals_by_field[field][idxs[0]]
            elif how == "last":
                rec[alias] = vals_by_field[field][idxs[-1]]
            else:
                rec[alias] = _np_reduce(vals_by_field[field], idxs, how)
        records.append(rec)
    return records


def _encode_suffix(suffix) -> str:
    """Pending-suffix state as base64 Arrow IPC bytes — a stable,
    versioned wire format, so checkpoint recovery survives pandas /
    Python upgrades (a pickled DataFrame would couple the checkpoint
    to the exact library versions of the workers that wrote it)."""
    import base64

    import pyarrow as pa

    table = pa.Table.from_pandas(suffix, preserve_index=False)
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as writer:
        writer.write_table(table)
    return base64.b64encode(sink.getvalue().to_pybytes()).decode("ascii")


def _decode_suffix(blob: str):
    import base64

    import pyarrow as pa

    with pa.ipc.open_stream(base64.b64decode(blob)) as reader:
        return reader.read_all().to_pandas()


def match_recognize_stream(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    pattern: list[tuple[str, str]],
    define: dict[str, str],
    measures: list[tuple[str, str, str | None, str]],
    max_pending_rows: int = 10_000,
    within=None,
    after_match: str = "past last row",
) -> DataFrame:
    """Streaming MATCH_RECOGNIZE: the same subset as
    :func:`match_recognize`, maintained per micro-batch with
    ``applyInPandasWithState`` — Flink's streaming CEP analog (the
    reference's engine is stream-first; pattern state rides Flink's
    checkpoints there, TiFlinkApp.java:270).

    Matches may SPAN micro-batch boundaries: per partition the state
    carries (match ordinal, pending row suffix), where the pending
    suffix starts at the first position whose greedy attempt ran out
    of ROWS — everything before it is decided (emitted or permanently
    failed; adding data can never revive a mid-pattern mismatch, only
    an end-of-data one). A complete-but-provisional match at the data
    edge is held too: a greedier assignment may materialize with the
    next batch (Flink's greedy rule). Emission is append-mode — one
    row per COMPLETED match, exactly once across triggers.

    Contract: ``order_by`` columns must be sortable and globally
    ordered across triggers for each partition (the per-batch file/CDC
    order of any keyed changelog). ``max_pending_rows`` bounds the
    per-partition state: a candidate that has buffered more than this
    many rows without resolving is EVICTED — its held within-bound
    match (if complete on the rows at hand) emits and the scan resumes
    past it; a partial candidate is abandoned one row forward.
    ``within`` is Flink's WITHIN proper, over the FIRST order column:
    the greedy search runs inside each candidate's window, and a
    candidate whose window has closed (the newest row is past
    start+within) is decided finally — so the drained stream equals
    the batch answer by construction, and state lookback is bounded by
    the window (unbounded lookback is a leak, not a feature).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    pat_vars, steps = _validate(pattern, define, measures)
    skip = _parse_skip(after_match, pat_vars)
    define_rw, nav_cols = _rewrite_nav(define)
    # PREV/NEXT in streaming: lag/lead cannot see across the trigger
    # boundary, but the pending-suffix state ALREADY buffers the rows a
    # bounded physical lookback needs — so nav-bearing DEFINEs compile
    # through the run-state path (restricted comparison grammar,
    # evaluated in the matcher) and the nav columns are computed by
    # pandas shift over the cross-batch buffer. Two state extensions
    # make the boundary exact: a k_prev-row CONTEXT tail is retained
    # before the pending suffix (PREV at a match start navigates into
    # already-decided rows), and the last k_next rows of every buffer
    # are HELD back from matching (their NEXT values arrive with the
    # next trigger; the order contract guarantees later rows only
    # append). Unbounded lookahead at a true stream edge stays held —
    # the same contract as a complete-but-provisional edge match.
    nav_vars = {
        v
        for v, p in define_rw.items()
        if p is not None and any(name in p for name in nav_cols)
    }
    k_prev = max(
        [k for (fn, _c, k) in nav_cols.values() if fn == "prev"], default=0
    )
    k_next = max(
        [k for (fn, _c, k) in nav_cols.values() if fn == "next"], default=0
    )
    rs_compiled, rs_value_cols = _prepare_runstate(
        define_rw, steps, force=frozenset(nav_vars)
    )
    nav_src_cols = sorted({c for (_fn, c, _k) in nav_cols.values()})
    # JVM stage: nav/run-state vars get always-true flags (their real
    # predicate runs in the matcher); pass NO nav columns so the
    # lag/lead (batch-only) path is never entered.
    work = _flag_columns(
        df, pat_vars, define_rw, {}, runstate_vars=set(rs_compiled)
    )
    out_fields = _output_fields(df, partition_by, measures)
    out_schema = StructType(out_fields)

    meas = list(measures)
    part_cols = list(partition_by)
    order_cols = list(order_by)
    carry_cols = list(
        dict.fromkeys(
            [*part_cols, *order_cols]
            + [f for _, _, f, _ in meas if f is not None]
            + sorted(rs_value_cols - set(nav_cols))
            + nav_src_cols
            + [f"__m_{v}" for v in pat_vars]
        )
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            seq0, blob, ctx0 = state.get
            prior = _decode_suffix(blob) if blob else None
        else:
            seq0, prior, ctx0 = 0, None, 0
        parts = ([] if prior is None or prior.empty else [prior]) + [
            p[carry_cols] for p in pdfs
        ]
        pdf = pd.concat(parts, ignore_index=True) if parts else None
        cols = [f.name for f in out_fields]
        if pdf is None or pdf.empty:
            yield pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
            return
        # The prior suffix (incl. its context head) precedes every new
        # row under the order contract; the stable sort keeps it first.
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        # physical nav columns over the CROSS-BATCH buffer (lag/lead
        # cannot span triggers; shift over the reassembled buffer can)
        for name, (fn, col, k) in nav_cols.items():
            pdf[name] = pdf[col].shift(k if fn == "prev" else -k)
        flags = {v: pdf[f"__m_{v}"].to_numpy() for v in pat_vars}
        rs_evals = _bind_runstate(rs_compiled, rs_value_cols, pdf, flags)
        rt_steps = _runtime_steps(steps, flags, rs_evals)
        n = len(pdf)
        # NEXT hold-back: the last k_next rows' forward values arrive
        # with the next trigger — matching stops short of them so no
        # decision ever reads a not-yet-final NaN.
        n_eff = max(int(ctx0), n - k_next)
        ovals = pdf[order_cols[0]].to_numpy() if within is not None else None
        matches, pending = _scan(
            rt_steps,
            n_eff,
            streaming=True,
            ovals=ovals,
            within=within,
            max_rows=max_pending_rows,
            skip=skip,
            flags=flags,
            start=int(ctx0),
        )
        records = _measure_rows(pdf, matches, part_cols, meas, flags, seq0=seq0)
        # retain a k_prev-row context head before the pending suffix so
        # PREV at the next trigger's first candidate can navigate into
        # already-decided rows
        cut = max(0, pending - k_prev)
        suffix = pdf.iloc[cut:][carry_cols].reset_index(drop=True)
        state.update(
            (
                seq0 + len(matches),
                _encode_suffix(suffix) if len(suffix) else "",
                pending - cut,
            )
        )
        if records:
            yield pd.DataFrame.from_records(records, columns=cols)
        else:
            yield pd.DataFrame({c: pd.Series(dtype=object) for c in cols})

    return work.select(*carry_cols).groupBy(*part_cols).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="seq long, pending string, ctx long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
