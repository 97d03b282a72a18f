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


def _scan(flags: dict, steps: list, n: int, streaming: bool):
    """Left-to-right non-overlapping scan (AFTER MATCH SKIP PAST LAST
    ROW) → (matches, pending_start). In streaming mode the scan STOPS
    at the first position whose attempt saw end-of-data (even if a
    complete-but-provisional match exists — a greedier assignment may
    materialize with the next batch); ``pending_start`` is where the
    next batch must resume. Batch mode always runs to the end
    (pending_start == n)."""
    matches, i, pending = [], 0, n
    while i < n:
        spans, eof = _attempt(i, 0, flags, steps, n)
        if streaming and eof:
            pending = i
            break
        if spans is not None:
            matches.append(spans)
            i = spans[-1][2]
        else:
            i += 1
    return matches, pending


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    pattern: list[tuple[str, str]],
    define: dict[str, str],
    measures: list[tuple[str, str, str | None, str]],
) -> DataFrame:
    """One output row per (non-overlapping, greedy) pattern match.

    ``pattern``: [(var, quant)] with quant in {"1", "+"};
    ``define``: var -> row-local SQL predicate (missing var = always);
    ``measures``: [(alias, var, field_or_None, how)] with how in
    first/last/min/max/sum (field required) or count (field ignored).
    Output schema: partition keys, ``match_seq`` (long), measures.
    """
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

    # Stage 1 (JVM): one boolean column per pattern variable. NULL
    # predicates read as no-match, like SQL WHERE.
    work = df
    for var in pat_vars:
        pred = define.get(var)
        col = (
            F.coalesce(F.expr(pred).cast("boolean"), F.lit(False))
            if pred is not None
            else F.lit(True)
        )
        work = work.withColumn(f"__m_{var}", col)

    in_fields = {f.name: f for f in df.schema.fields}
    out_fields = [in_fields[c] for c in partition_by]
    out_fields.append(StructField("match_seq", LongType(), False))
    for alias, var, field, how in measures:
        if how == "count":
            out_fields.append(StructField(alias, LongType(), False))
        else:
            src = in_fields[field]
            out_fields.append(StructField(alias, src.dataType, True))
    out_schema = StructType(out_fields)

    steps = list(pattern)
    meas = list(measures)
    part_cols = list(partition_by)
    order_cols = list(order_by)

    def run(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        flags = {v: pdf[f"__m_{v}"].to_numpy() for v in pat_vars}
        matches, _ = _scan(flags, steps, len(pdf), streaming=False)
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

    Contract: ``order_by`` columns must be primitive and globally
    ordered across triggers for each partition (the per-batch file/CDC
    order of any keyed changelog); the pending suffix is pickled into
    the state row, so it stays micro-batch-bounded by construction.
    """
    import base64
    import pickle

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    pat_vars = [v for v, _ in pattern]
    if not pattern or any(q not in ("1", "+") for _, q in pattern):
        raise ValueError("pattern must be [(var, '1'|'+'), ...]")
    for alias, var, field, how in measures:
        if var not in pat_vars or how not in _HOWS:
            raise ValueError(f"bad measure {alias}")
        if how != "count" and field is None:
            raise ValueError(f"measure {alias}: {how} needs a field")

    work = df
    for var in pat_vars:
        pred = define.get(var)
        col = (
            F.coalesce(F.expr(pred).cast("boolean"), F.lit(False))
            if pred is not None
            else F.lit(True)
        )
        work = work.withColumn(f"__m_{var}", col)

    in_fields = {f.name: f for f in df.schema.fields}
    out_fields = [in_fields[c] for c in partition_by]
    out_fields.append(StructField("match_seq", LongType(), False))
    for alias, var, field, how in measures:
        if how == "count":
            out_fields.append(StructField(alias, LongType(), False))
        else:
            out_fields.append(StructField(alias, in_fields[field].dataType, True))
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
        matches, pending = _scan(flags, steps, len(pdf), streaming=True)
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
