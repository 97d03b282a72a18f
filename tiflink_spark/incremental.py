"""Retraction-aware incremental aggregate maintenance (SURVEY M2).

The reference delegates incremental computation to Flink's update-mode
StreamSQL operators (TiFlinkApp.java:270); this module re-expresses the
same maintenance math as per-micro-batch DataFrame algebra:

- Every upsert-changelog batch is converted to a **retraction delta**:
  weight +1 rows for new values, weight -1 rows for the displaced old
  values (fetched from the versioned base store — Spark's analog of
  Flink's operator state).
- **Invertible aggregates** (COUNT/SUM/AVG) merge deltas into the old
  per-group state with pure arithmetic — per-batch work ∝ changed
  rows, never table size.
- **Non-invertible aggregates** (MIN/MAX) recompute only the *dirty
  groups* against the new base state — per-batch work ∝ rows of
  touched groups (the value→count-multiset alternative keeps state
  unbounded; dirty-group recompute is the scale-safe Spark form).

At 100 TB the shuffles here are keyed by group key and bounded by the
batch's touched keys; the base-store join is bucket-pruned by PK.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiflink_spark.changelog import (
    OP_COL,
    OP_DELETE,
    OP_UPDATE,
    SEQ_COL,
    last_change_per_key,
)

INVERTIBLE = ("count", "sum", "avg")
# Non-invertible aggregates maintain correctness by dirty-group recompute.
# COUNT DISTINCT sits here too: the alternative — a (group, value)->count
# auxiliary state store — bounds per-batch work by delta size instead of
# dirty-group volume, but its state is proportional to distinct values
# (often ~ table size). Dirty-group recompute needs no extra state and
# its shuffle is pruned to touched groups; at 100 TB that trade is right
# unless a group's row volume is pathological (same caveat as MIN/MAX).
NON_INVERTIBLE = (
    "min",
    "max",
    "count_distinct",
    "sum_distinct",
    "avg_distinct",
    "stddev_samp",
    "var_samp",
    "median",
)
# stddev/variance COULD merge invertibly via (n, sum, sum-of-squares)
# delta arithmetic, but catastrophic cancellation under heavy retraction
# makes the running sumsq numerically unsafe; dirty-group recompute uses
# Spark's stable single-pass estimator instead, same trade as MIN/MAX.


def _mexpr(m: "Measure"):
    """Measure input as a Column. ``col`` may be a bare column name or
    any row-local SQL expression (e.g. ``o_totalprice * (1 - disc)``) —
    the planner validates expressions against the source schema before
    a Measure carrying one reaches maintenance."""
    return F.expr(m.col)


@dataclass(frozen=True)
class Measure:
    kind: str  # count | sum | avg | min | max | count_distinct | stddev_samp | var_samp
    col: str | None  # None for count(*); may be a row-local expression
    alias: str

    def __post_init__(self):
        if self.kind not in INVERTIBLE + NON_INVERTIBLE:
            raise ValueError(f"unknown measure kind: {self.kind}")
        if self.kind != "count" and self.col is None:
            raise ValueError(f"{self.kind} needs a column")


def compute_delta(
    changes: DataFrame,
    old_rows: DataFrame,
    pk: list[str],
    final: DataFrame | None = None,
    old_rows_pruned: bool = False,
) -> DataFrame:
    """Upsert changelog + displaced old rows → retraction delta (__w ±1).

    ``old_rows`` must be the pre-batch base rows for (at least) the
    changed keys. A +U/-D on an existing key retracts the old row; a
    +I/+U adds the new one. The changelog contract has no UPDATE_BEFORE
    (TikvDynamicSource.java:47-53) — the old value comes from state,
    exactly as the reference's sink reads TiKV by key.

    ``final`` is the caller's precomputed ``last_change_per_key``
    result when it already built one (the agg refresh derives its
    changed-key set from the same frame) — reusing it drops a window
    computation and a broadcast job per lineage execution from the
    per-batch floor. ``old_rows_pruned=True`` asserts the caller
    already restricted ``old_rows`` to the changed keys (the agg
    refresh builds it as exactly that semi-join), skipping the
    defensive re-prune — one broadcast job per execution.
    """
    value_cols = [c for c in old_rows.columns]
    if final is None:
        final = last_change_per_key(changes, pk)
    # retract: any final op on a key that exists in the base. The key
    # set is δ-bounded — BROADCAST it explicitly: the MOR-chain lineage
    # under old_rows has no size stats, so without the hint Catalyst
    # falls back to a sort-merge join that shuffles the whole base side
    # through the delta-tuned (tiny) partition count — measured as the
    # O(table) leak that made refresh SLOWER than recompute at sf10.
    retract_src = (
        old_rows
        if old_rows_pruned
        else old_rows.join(F.broadcast(final.select(*pk)), pk, "left_semi")
    )
    retracts = retract_src.select(*value_cols, F.lit(-1).alias("__w"))
    adds = final.filter(F.col(OP_COL) != OP_DELETE).select(
        *value_cols, F.lit(1).alias("__w")
    )
    return retracts.unionByName(adds)


def _state_cols(measures: list[Measure]) -> list[str]:
    """Internal state columns backing the measures."""
    cols = ["__rows"]
    for m in measures:
        if m.kind in ("sum", "avg"):
            cols.append(f"__sum_{m.alias}")
        # sum ALSO keeps a non-null count: a group whose values are all
        # NULL must present SUM as NULL, not 0, to match batch semantics.
        if m.kind in ("sum", "avg") or (m.kind == "count" and m.col is not None):
            cols.append(f"__cnt_{m.alias}")
        if m.kind in NON_INVERTIBLE:
            cols.append(f"__ext_{m.alias}")
    return cols


def _state_aggs(measures: list[Measure]) -> list:
    """Aggregate expressions filling the internal state schema."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for m in measures:
        if m.kind in ("sum", "avg"):
            aggs.append(F.sum(_mexpr(m)).alias(f"__sum_{m.alias}"))
        if m.kind in ("sum", "avg") or (m.kind == "count" and m.col is not None):
            aggs.append(F.count(_mexpr(m)).alias(f"__cnt_{m.alias}"))
        if m.kind == "min":
            aggs.append(F.min(_mexpr(m)).alias(f"__ext_{m.alias}"))
        if m.kind == "max":
            aggs.append(F.max(_mexpr(m)).alias(f"__ext_{m.alias}"))
        if m.kind == "count_distinct":
            aggs.append(F.count_distinct(_mexpr(m)).alias(f"__ext_{m.alias}"))
        if m.kind == "sum_distinct":
            # DISTINCT strips the multiplicities delta arithmetic relies
            # on, so these ride the dirty-group recompute like MIN/MAX
            aggs.append(F.sum_distinct(_mexpr(m)).alias(f"__ext_{m.alias}"))
        if m.kind == "avg_distinct":
            aggs.append(
                F.when(
                    F.count_distinct(_mexpr(m)) > 0,
                    F.sum_distinct(_mexpr(m)) / F.count_distinct(_mexpr(m)),
                ).alias(f"__ext_{m.alias}")
            )
        if m.kind == "stddev_samp":
            aggs.append(F.stddev_samp(_mexpr(m)).alias(f"__ext_{m.alias}"))
        if m.kind == "var_samp":
            aggs.append(F.var_samp(_mexpr(m)).alias(f"__ext_{m.alias}"))
        if m.kind == "median":
            # exact interpolated median (percentile 0.5) — order-based,
            # so the only scale-safe maintenance is dirty-group
            # recompute, same as MIN/MAX
            aggs.append(F.median(_mexpr(m)).alias(f"__ext_{m.alias}"))
    return aggs


# Measures whose value is bit-identical across two executions of the
# same lineage regardless of reduce-side combine order: counts are
# integral, min/max pick an existing value, exact median sorts.
_ORDER_INSENSITIVE_KINDS = frozenset(
    {"count", "count_distinct", "min", "max", "median"}
)
_FLOAT_TYPES = ("double", "float")


def measures_order_insensitive(measures: list[Measure], sample: DataFrame) -> bool:
    """True when every measure is safe to execute TWICE from the same
    unmaterialized lineage and compare bit-for-bit (the concurrent
    state∥target overlap does exactly that).

    Float summation is the hazard: reduce-side combine order follows
    nondeterministic shuffle-fetch arrival, so SUM/AVG/STDDEV over
    double/float columns can diverge by ulps between the two runs —
    enough to flip an exact-equality hash gate. Integral and decimal
    sums are exact in any order; count/min/max/median are
    order-insensitive for every type. ``sample`` supplies the schema
    the measure expressions are typed against (no job runs)."""
    exprs = []
    for i, m in enumerate(measures):
        if m.kind in _ORDER_INSENSITIVE_KINDS:
            continue
        if m.kind in ("stddev_samp", "var_samp"):
            # float arithmetic inside Spark's single-pass estimator
            # regardless of the input type
            return False
        exprs.append((i, _mexpr(m).alias(f"__m{i}")))
    if not exprs:
        return True
    dtypes = dict(sample.select(*[e for _, e in exprs]).dtypes)
    return not any(dtypes[f"__m{i}"] in _FLOAT_TYPES for i, _ in exprs)


def aggregate_state(df: DataFrame, group_keys: list[str], measures: list[Measure]) -> DataFrame:
    """Full aggregate of a base table into the internal state schema
    (used at bootstrap and for dirty-group recompute)."""
    return df.groupBy(*group_keys).agg(*_state_aggs(measures))


def aggregate_global_state(
    df: DataFrame, measures: list[Measure], key_name: str = "__g"
) -> DataFrame:
    """Global (no GROUP BY) aggregate into the internal state schema.

    ``df.groupBy().agg(...)`` yields exactly one row even over an empty
    input — SQL's global-aggregate semantics (COUNT 0, SUM/MIN/MAX
    NULL) — tagged with the constant hidden key the keyed stores
    address. The key leads the column order, matching the grouped
    state layout."""
    out = df.groupBy().agg(*_state_aggs(measures)).withColumn(key_name, F.lit(0))
    return out.select(key_name, *[c for c in out.columns if c != key_name])


def merge_delta_state(
    old_state: DataFrame,
    delta: DataFrame,
    new_base,
    group_keys: list[str],
    measures: list[Measure],
    dirty_keys: DataFrame | None = None,
) -> DataFrame:
    """New state for every dirty group.

    Invertible measures: old ⊕ weighted-delta. Non-invertible: the
    dirty groups are recomputed from ``new_base`` (pruned to those
    groups with a semi-join before the shuffle). ``new_base`` may be a
    zero-arg callable returning the DataFrame — it is only invoked when
    a non-invertible measure exists, so invertible-only MVs skip the
    (driver-side) cost of constructing the post-batch base read.

    Returns state rows for dirty groups only; ``__rows == 0`` means the
    group vanished (caller deletes / emits zero, per query shape).

    ``dirty_keys`` is an optional caller-supplied frame of exactly the
    delta's distinct group keys, built from a CHEAPER lineage than the
    delta aggregate (the agg refresh derives it straight from the
    changed rows' old∪new group memberships): broadcasting it skips
    re-executing the delta aggregation just to materialize the key
    set. A superset of the delta's keys is also correct — extra groups
    only widen the state prune, and the left joins drop them.
    """
    has_noninv = any(m.kind in NON_INVERTIBLE for m in measures)

    # Weighted partial aggregate of the delta per group.
    aggs = [F.sum("__w").alias("__d_rows")]
    for m in measures:
        if m.kind in ("sum", "avg"):
            aggs.append(
                F.sum(F.col("__w") * F.coalesce(_mexpr(m), F.lit(0))).alias(f"__d_sum_{m.alias}")
            )
        if m.kind in ("sum", "avg") or (m.kind == "count" and m.col is not None):
            aggs.append(
                F.sum(F.when(_mexpr(m).isNotNull(), F.col("__w")).otherwise(0)).alias(
                    f"__d_cnt_{m.alias}"
                )
            )
    d = delta.groupBy(*group_keys).agg(*aggs)

    # dirty keys are δ-bounded: broadcast them so the O(groups) state
    # scan and the O(table) recompute base below stay map-side instead
    # of shuffling through the delta-tuned partition count
    if dirty_keys is None:
        dirty_keys = d.select(*group_keys)
    old_dirty = old_state.join(F.broadcast(dirty_keys), group_keys, "left_semi")
    j = d.join(old_dirty, group_keys, "left")

    out_cols = [*[F.col(c) for c in group_keys]]
    out_cols.append((F.coalesce(F.col("__rows"), F.lit(0)) + F.col("__d_rows")).alias("__rows"))
    for m in measures:
        if m.kind in ("sum", "avg"):
            out_cols.append(
                (F.coalesce(F.col(f"__sum_{m.alias}"), F.lit(0)) + F.col(f"__d_sum_{m.alias}")).alias(
                    f"__sum_{m.alias}"
                )
            )
        if m.kind in ("sum", "avg") or (m.kind == "count" and m.col is not None):
            out_cols.append(
                (F.coalesce(F.col(f"__cnt_{m.alias}"), F.lit(0)) + F.col(f"__d_cnt_{m.alias}")).alias(
                    f"__cnt_{m.alias}"
                )
            )
    inv_state = j.select(*out_cols)

    if not has_noninv:
        return inv_state

    # Non-invertible: recompute dirty groups from the new base.
    if callable(new_base):
        new_base = new_base()
    pruned = new_base.join(F.broadcast(dirty_keys), group_keys, "left_semi")
    recomputed = aggregate_state(pruned, group_keys, measures)
    # Groups that vanished entirely produce no recomputed row — keep the
    # invertible row (with __rows 0) so callers can see the vanish.
    ext_cols = [f"__ext_{m.alias}" for m in measures if m.kind in NON_INVERTIBLE]
    return inv_state.join(
        recomputed.select(*group_keys, *ext_cols), group_keys, "left"
    )


def present_measures(
    state: DataFrame, measures: list[Measure], keep: tuple[str, ...] = ()
) -> DataFrame:
    """Project internal state columns into the user-facing measure values.

    ``keep`` names engine-internal (``__``-prefixed) columns that must
    survive the projection — e.g. the global shape's hidden constant
    group key, which addresses the target store."""
    cols = list(state.columns)
    out = []
    for c in cols:
        if not c.startswith("__") or c in keep:
            out.append(F.col(c))
    for m in measures:
        if m.kind == "count" and m.col is None:
            out.append(F.col("__rows").alias(m.alias))
        elif m.kind == "count":
            out.append(F.col(f"__cnt_{m.alias}").alias(m.alias))
        elif m.kind == "sum":
            # SUM over zero non-null values is NULL in SQL, not 0.
            out.append(
                F.when(F.col(f"__cnt_{m.alias}") > 0, F.col(f"__sum_{m.alias}")).alias(m.alias)
            )
        elif m.kind == "avg":
            out.append(
                (F.col(f"__sum_{m.alias}") / F.nullif(F.col(f"__cnt_{m.alias}"), F.lit(0))).alias(
                    m.alias
                )
            )
        elif m.kind == "count_distinct":
            # batch COUNT(DISTINCT) of a dirty group that lost every row
            # presents as 0, not NULL (recomputed row absent -> NULL ext).
            out.append(F.coalesce(F.col(f"__ext_{m.alias}"), F.lit(0)).alias(m.alias))
        else:  # min/max
            out.append(F.col(f"__ext_{m.alias}").alias(m.alias))
    return state.select(*out)
