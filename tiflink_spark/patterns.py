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
- PATTERN: a sequence of variables, each with quantifier ``1`` or
  ``+`` (greedy, with backtracking — ``B+ C`` gives back rows when C
  needs them, Flink's default greedy semantics);
- DEFINE: row-local predicates over the CURRENT row's columns (no
  LAST()/FIRST() navigation — the Flink forms that need run state);
  an undefined variable matches every row (Flink's rule);
- AFTER MATCH SKIP PAST LAST ROW (the default), so matches never
  overlap and the scan is a single left-to-right pass;
- MEASURES: FIRST/LAST column of a variable's rows, COUNT/SUM/MIN/MAX
  over them; plus the partition keys and ``match_seq`` (1-based match
  ordinal within the partition, the MATCH_NUMBER() analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

_HOWS = ("first", "last", "count", "sum", "min", "max")


def _validate(pattern, define, measures) -> list[str]:
    """Shared spec validation for the batch AND streaming entry points
    (one implementation — the two cannot drift)."""
    pat_vars = [v for v, _ in pattern]
    if not pattern or any(q not in ("1", "+") for _, q in pattern):
        raise ValueError("pattern must be [(var, '1'|'+'), ...]")
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
    return pat_vars


def _flag_columns(df: DataFrame, pat_vars: list[str], define: dict) -> DataFrame:
    """Stage 1 (JVM): one boolean column per pattern variable — the
    DEFINE predicates run in whole-stage codegen; NULL reads as
    no-match, like SQL WHERE. Undefined variables match every row
    (Flink's rule)."""
    work = df
    for var in pat_vars:
        pred = define.get(var)
        col = (
            F.coalesce(F.expr(pred).cast("boolean"), F.lit(False))
            if pred is not None
            else F.lit(True)
        )
        work = work.withColumn(f"__m_{var}", col)
    return work


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


def _attempt(pos: int, si: int, flags: dict, steps: list, n: int):
    """Match ``steps[si:]`` at ``pos`` → (spans | None, eof_seen).

    ``eof_seen`` is True when the greedy exploration ran out of ROWS at
    or before reaching this outcome — the streaming signal that more
    data could change (or create) the match, so a stateful consumer
    must hold the candidate instead of deciding. Batch callers ignore
    it (end of data is final there)."""
    if si == len(steps):
        return [], False
    var, quant = steps[si]
    col = flags[var]
    if pos >= n:
        return None, True
    if not col[pos]:
        return None, False
    if quant == "1":
        rest, eof = _attempt(pos + 1, si + 1, flags, steps, n)
        if rest is None:
            return None, eof
        return [(var, pos, pos + 1)] + rest, eof
    # '+': greedy, longest first, with backtracking
    k = pos
    while k < n and col[k]:
        k += 1
    eof_any = k == n  # the run itself could grow with more rows
    for end in range(k, pos, -1):
        rest, eof = _attempt(end, si + 1, flags, steps, n)
        eof_any = eof_any or eof
        if rest is not None:
            return [(var, pos, end)] + rest, eof_any
    return None, eof_any


def _scan(
    flags: dict,
    steps: list,
    n: int,
    streaming: bool,
    ovals=None,
    within=None,
    max_rows: int | None = None,
):
    """Left-to-right non-overlapping scan (AFTER MATCH SKIP PAST LAST
    ROW) → (matches, pending_start). In streaming mode the scan STOPS
    at the first position whose attempt saw end-of-data (even if a
    complete-but-provisional match exists — a greedier assignment may
    materialize with the next batch); ``pending_start`` is where the
    next batch must resume. Batch mode always runs to the end
    (pending_start == n).

    ``within`` (with ``ovals``, the first order column's values) is
    Flink's WITHIN: a match whose first→last order span exceeds it is
    discarded (scan resumes one row later). In streaming mode it also
    FINALIZES stale blocked candidates: once the newest row is more
    than ``within`` past a candidate's start, no future data can
    produce a within-bound greedier match, so a held provisional match
    emits now (the pattern-timeout behavior) and a partial one is
    abandoned. ``max_rows`` is the row-count state bound: a blocked
    candidate buffering more rows than this is abandoned outright."""
    matches, i = [], 0

    def span_of(spans):
        return ovals[spans[-1][2] - 1] - ovals[spans[0][1]]

    while i < n:
        spans, eof = _attempt(i, 0, flags, steps, n)
        if streaming and eof:
            stale = within is not None and (ovals[n - 1] - ovals[i]) > within
            too_big = max_rows is not None and (n - i) > max_rows
            if not (stale or too_big):
                return matches, i  # hold as pending
            if stale and spans is not None and span_of(spans) <= within:
                matches.append(spans)  # timed out: finalize the held match
                i = spans[-1][2]
                continue
            i += 1  # abandon this start
            continue
        if spans is None:
            i += 1
            continue
        if within is not None and span_of(spans) > within:
            i += 1  # match too wide — discarded, rows stay available
            continue
        matches.append(spans)
        i = spans[-1][2]
    return matches, n


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    pattern: list[tuple[str, str]],
    define: dict[str, str],
    measures: list[tuple[str, str, str | None, str]],
    within=None,
) -> DataFrame:
    """One output row per (non-overlapping, greedy) pattern match.

    ``pattern``: [(var, quant)] with quant in {"1", "+"};
    ``define``: var -> row-local SQL predicate (missing var = always);
    ``measures``: [(alias, var, field_or_None, how)] with how in
    first/last/min/max/sum (field required) or count (field ignored);
    ``within``: Flink's WITHIN — the maximum first→last span of a
    match over the FIRST order_by column (a number for numeric order
    columns, a pandas/numpy timedelta for timestamps); wider matches
    are discarded.
    Output schema: partition keys, ``match_seq`` (long), measures.
    """
    pat_vars = _validate(pattern, define, measures)
    work = _flag_columns(df, pat_vars, define)
    out_fields = _output_fields(df, partition_by, measures)
    out_schema = StructType(out_fields)

    steps = list(pattern)
    meas = list(measures)
    part_cols = list(partition_by)
    order_cols = list(order_by)

    def run(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        flags = {v: pdf[f"__m_{v}"].to_numpy() for v in pat_vars}
        ovals = pdf[order_cols[0]].to_numpy() if within is not None else None
        matches, _ = _scan(
            flags, steps, len(pdf), streaming=False, ovals=ovals, within=within
        )
        records = _measure_rows(pdf, matches, part_cols, meas, seq0=0)
        cols = [f.name for f in out_fields]
        if not records:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
        return pd.DataFrame.from_records(records, columns=cols)

    return work.groupBy(*part_cols).applyInPandas(run, schema=out_schema)


def _measure_rows(pdf, matches, part_cols, meas, seq0: int) -> list[dict]:
    """One output record per match: partition keys + match_seq +
    MEASURES evaluated over each variable's matched rows."""
    records = []
    for mi, spans in enumerate(matches, start=1):
        rec = {c: pdf.at[0, c] for c in part_cols}
        rec["match_seq"] = seq0 + mi
        by_var: dict[str, list[tuple[int, int]]] = {}
        for var, s, e in spans:
            by_var.setdefault(var, []).append((s, e))
        for alias, var, field, how in meas:
            idxs = [j for s, e in by_var.get(var, []) for j in range(s, e)]
            if how == "count":
                rec[alias] = len(idxs)
            elif not idxs:
                rec[alias] = None
            elif how == "first":
                rec[alias] = pdf.at[idxs[0], field]
            elif how == "last":
                rec[alias] = pdf.at[idxs[-1], field]
            else:
                rec[alias] = getattr(pdf.loc[idxs, field], how)()
        records.append(rec)
    return records


def match_recognize_stream(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    pattern: list[tuple[str, str]],
    define: dict[str, str],
    measures: list[tuple[str, str, str | None, str]],
    max_pending_rows: int = 10_000,
    within=None,
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
    many rows without resolving is EVICTED — its start position is
    abandoned and the scan resumes just past it, emitting any matches
    that were only blocked by ordering. ``within`` is Flink's WITHIN
    proper, over the FIRST order column: matches wider than it are
    discarded, and a blocked candidate whose start is more than
    ``within`` behind the newest row FINALIZES — its held provisional
    match (if any) emits, a partial one is abandoned — which is the
    pattern-timeout rule AND a tighter state bound than the row count
    (unbounded lookback is a leak, not a feature).
    """
    import base64
    import pickle

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    pat_vars = _validate(pattern, define, measures)
    work = _flag_columns(df, pat_vars, define)
    out_fields = _output_fields(df, partition_by, measures)
    out_schema = StructType(out_fields)

    steps = list(pattern)
    meas = list(measures)
    part_cols = list(partition_by)
    order_cols = list(order_by)
    carry_cols = list(
        dict.fromkeys(
            [*part_cols, *order_cols]
            + [f for _, _, f, _ in meas if f is not None]
            + [f"__m_{v}" for v in pat_vars]
        )
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            seq0, blob = state.get
            prior = pickle.loads(base64.b64decode(blob)) if blob else None
        else:
            seq0, prior = 0, None
        parts = ([] if prior is None or prior.empty else [prior]) + [
            p[carry_cols] for p in pdfs
        ]
        pdf = pd.concat(parts, ignore_index=True) if parts else None
        cols = [f.name for f in out_fields]
        if pdf is None or pdf.empty:
            yield pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
            return
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        flags = {v: pdf[f"__m_{v}"].to_numpy() for v in pat_vars}
        n = len(pdf)
        ovals = pdf[order_cols[0]].to_numpy() if within is not None else None
        matches, pending = _scan(
            flags,
            steps,
            n,
            streaming=True,
            ovals=ovals,
            within=within,
            max_rows=max_pending_rows,
        )
        records = _measure_rows(pdf, matches, part_cols, meas, seq0=seq0)
        suffix = pdf.iloc[pending:].reset_index(drop=True)
        state.update(
            (
                seq0 + len(matches),
                base64.b64encode(pickle.dumps(suffix)).decode("ascii")
                if len(suffix)
                else "",
            )
        )
        if records:
            yield pd.DataFrame.from_records(records, columns=cols)
        else:
            yield pd.DataFrame({c: pd.Series(dtype=object) for c in cols})

    return work.select(*carry_cols).groupBy(*part_cols).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="seq long, pending string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
