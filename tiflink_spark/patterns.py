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
        n = len(pdf)
        flags = {v: pdf[f"__m_{v}"].to_numpy() for v in pat_vars}

        def attempt(pos: int, si: int):
            """Match steps[si:] at pos → list of (var, start, end) spans
            or None. '+' is greedy with backtracking."""
            if si == len(steps):
                return []
            var, quant = steps[si]
            col = flags[var]
            if quant == "1":
                if pos < n and col[pos]:
                    rest = attempt(pos + 1, si + 1)
                    if rest is not None:
                        return [(var, pos, pos + 1)] + rest
                return None
            k = pos
            while k < n and col[k]:
                k += 1
            for end in range(k, pos, -1):  # longest first = greedy
                rest = attempt(end, si + 1)
                if rest is not None:
                    return [(var, pos, end)] + rest
            return None

        records = []
        i, seq = 0, 0
        while i < n:
            spans = attempt(i, 0)
            if spans is None:
                i += 1
                continue
            seq += 1
            rec = {c: pdf.at[0, c] for c in part_cols}
            rec["match_seq"] = seq
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
                    vals = pdf.loc[idxs, field]
                    rec[alias] = getattr(vals, how)()
            records.append(rec)
            i = spans[-1][2]  # AFTER MATCH SKIP PAST LAST ROW
        cols = [f.name for f in out_fields]
        if not records:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
        return pd.DataFrame.from_records(records, columns=cols)

    return work.groupBy(*part_cols).applyInPandas(run, schema=out_schema)
