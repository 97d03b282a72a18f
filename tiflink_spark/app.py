"""MVApp — the engine's user entry point.

Mirrors the reference's only public API, `TiFlinkApp.Builder` →
`build()` → `start()` (TiFlinkApp.java:70-116, §3.1 of SURVEY.md):

    app = (MVApp.builder(spark)
           .source("orders", "/data/orders.parquet", pk=["o_orderkey"])
           .source("customer", "/data/customer.parquet", pk=["c_custkey"])
           .query("SELECT c_custkey, c_name, (SELECT count(*) FROM orders o "
                  "WHERE o.o_custkey = c.c_custkey) AS order_cnt FROM customer c")
           .target("/data/mv_author_counts")
           .build())
    app.bootstrap()                      # snapshot phase: batch run -> v0
    app.start_streaming(changelog_dirs)  # CDC phase: readStream -> MERGE
    app.read()                           # consistent MV state
    app.read(version=2)                  # stale snapshot (README.md:18-22)

Lifecycle parity with the reference:
1. catalog registration  (TiFlinkApp.java:263-268)
2. query resolution — Catalyst resolves the SQL, `df.schema` is the MV
   schema, PK defaults to the first output column (TiFlinkApp.java:276-281)
3. target DDL (generated; executed only if a JDBC hook is supplied —
   TiJDBCHelper.java:111-140 analog)
4. bootstrap: batch snapshot published as version 0
5. maintenance: per-micro-batch refresh, exactly-once by batch_id
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from tiflink_spark.catalog import Catalog, default_pk
from tiflink_spark.mv import (
    IncrementalAggMV,
    IncrementalJoinAggMV,
    IncrementalJoinMV,
    IncrementalTopKMV,
    RecomputeMV,
)
from tiflink_spark.incremental import Measure
from tiflink_spark.planner import (
    match_agg_shape,
    match_projection_shape,
    normalize_query,
    match_correlated_count_shape,
    match_distinct_shape,
    match_global_agg_shape,
    match_grouping_sets_shape,
    match_join_agg_shape,
    match_join_projection_shape,
    match_order_limit_shape,
    match_semijoin_shape,
    match_corr_semijoin_shape,
    match_corr_exists_shape,
    match_corr_scalar_shape,
    match_join_shape,
    match_setop_shape,
    match_full_outer_shape,
    match_theta_join_shape,
    match_topn_shape,
    match_union_all_shape,
    match_window_shape,
    spark_executable_query,
    split_group_order_limit,
    split_nested_query,
)
from tiflink_spark.store import KeyedParquetStore
from tiflink_spark.types import create_table_ddl

# cost_advisor default: a join-agg view whose FULL query executes within
# this many seconds refreshes cheaper by recompute than by the
# incremental path's multi-merge floor (calibration in
# MVAppBuilder.cost_advisor — every measured point through sf10 / ~11s
# full-query favored recompute for the star shape).
ADVISOR_FULL_QUERY_SECS = 15.0

# Maintenance strategies the advisor arbitrates: the agg-shaped routes
# whose per-batch floor (state+target merges, retraction lookups) can
# exceed a small table's full recompute. Pure-join/projection routes
# have no such floor and are never advised.
_ADVISED_STRATEGIES = (
    "IncrementalJoinAggMV",
    "IncrementalAggMV",
    "IncrementalGroupingSetsMV",
)


def _timed_full_execution(spark, df, threshold_secs: float):
    """Time ONE full materialization of ``df`` for the cost advisor,
    aborted at the threshold.

    Full materialization = a noop-sink write: ``count()`` lets Catalyst
    prune un-referenced aggregate/measure expressions and join outputs,
    under-measuring the true cost and biasing the advisor toward
    recompute. The probe runs in its own job group and is CANCELLED
    once ``threshold_secs`` elapses — past the threshold the decision
    is already "incremental", and at 100 TB an un-aborted probe is an
    unbounded full scan just to produce a number nobody needs.

    Returns (elapsed_secs, aborted)."""
    import threading as _threading
    import time as _time

    group = f"tiflink-advisor-{id(df):x}"
    done = _threading.Event()
    err: list = []

    def run():
        try:
            spark.sparkContext.setJobGroup(
                group, "cost-advisor full-query probe", interruptOnCancel=True
            )
            df.write.format("noop").mode("overwrite").save()
        except Exception as e:  # expected CancellationException on abort
            err.append(e)
        finally:
            done.set()

    t0 = _time.perf_counter()
    th = _threading.Thread(target=run, daemon=True, name="tiflink-advisor")
    th.start()
    if not done.wait(threshold_secs):
        spark.sparkContext.cancelJobGroup(group)
        done.wait(30)
        return _time.perf_counter() - t0, True
    elapsed = _time.perf_counter() - t0
    if err:
        raise err[0]
    return elapsed, False


class MVAppBuilder:
    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._sources: dict[str, tuple[str | DataFrame, list[str] | None]] = {}
        self._query: str | None = None
        self._target: str | None = None
        self._pk: list[str] | None = None
        self._num_buckets: int | None = None
        self._shuffle_partitions: int | None = None
        self._ddl_hook = None

    def source(
        self,
        name: str,
        path_or_df,
        pk: list[str] | None = None,
        event_time: str | None = None,
    ) -> "MVAppBuilder":
        """Register a source. ``event_time`` names the column at which
        a change to this table takes effect — required on a dim joined
        with ``FOR SYSTEM_TIME AS OF`` (the versioned-table time
        attribute, Flink's temporal-join contract)."""
        self._sources[name] = (path_or_df, pk, event_time)
        return self

    def query(self, sql: str) -> "MVAppBuilder":
        self._query = sql
        return self

    def target(self, path: str, pk: list[str] | None = None) -> "MVAppBuilder":
        self._target = path
        self._pk = pk
        return self

    def num_buckets(self, n: int) -> "MVAppBuilder":
        self._num_buckets = n
        return self

    def shuffle_partitions(self, n: int) -> "MVAppBuilder":
        """Maintenance-job parallelism: sized to per-batch delta volume
        (the reference's explicit parallelism knob, TiFlinkApp.java:243-246)."""
        self._shuffle_partitions = n
        return self

    def ddl_hook(self, fn) -> "MVAppBuilder":
        """Optional callable receiving the generated target DDL at
        bootstrap — the reference executes its generated CREATE TABLE
        against the target database the same way
        (TiJDBCHelper.java:111-140). Pair with
        ``connectors.jdbc_execute`` to run it over JDBC:

            .ddl_hook(lambda ddl: jdbc_execute(spark, url, ddl))
        """
        self._ddl_hook = fn
        return self

    def window_strategy(self, strategy: str) -> "MVAppBuilder":
        """OVER-window maintenance strategy: "sort" (default; Spark's
        repartition+sort per partition) or "domain" — the skew-proof
        two-pass plan for PEER-UNIFORM window functions (rank/
        dense_rank/percent_rank/cume_dist, running SUM/COUNT/AVG/MIN/
        MAX): groupBy(partition, order-value) pre-aggregate + window
        over the distinct-order-value domain + join back, so a hot
        partition key cannot pin one task. Raises at build when the
        query's window items are per-row (row_number/lag/lead) — those
        genuinely need the sort."""
        self._window_strategy = strategy
        return self

    def column_names(self, names: list[str]) -> "MVAppBuilder":
        """Override the MV's OUTPUT column names — the reference
        builder's ``setColumnNames`` (README.md:56,
        TiFlinkApp.java:88-99). Maintenance runs on the query's own
        names throughout (every store, every matcher); the rename is
        the user-facing layer: the generated DDL advertises the new
        names and ``read()`` returns them. A declared ``target(pk=...)``
        keeps referring to the QUERY's column names; the DDL maps it
        through the rename positionally."""
        self._column_names = list(names)
        return self

    def force_recompute(self, enabled: bool = True) -> "MVAppBuilder":
        """Pin the view to the RecomputeMV fallback, skipping every
        incremental probe. Two uses: A/B-measuring incremental
        maintenance against its recompute baseline on the SAME query
        (bench.py's mv_refresh block), and views whose churn profile
        (full-table rewrites per batch) makes recompute the cheaper
        plan."""
        self._force_recompute = enabled
        return self

    def late_dim(self, mode: str = "reorder") -> "MVAppBuilder":
        """Temporal-join late-dim policy. The default contract is
        "raise": a dim change whose event time precedes the key's open
        version fails loudly (Flink's event-time temporal join requires
        watermark-ordered versions). "reorder" instead SPLICES the late
        version retroactively — the dirty keys' version chains are
        rebuilt in event-time order, re-splitting affected validity
        intervals, and the standard post-dim-batch fact re-derivation
        moves earlier events onto the corrected versions (the history
        store's version rows support splits natively). Costs
        O(versions of dirty keys) per dim batch instead of O(δ)."""
        if mode not in ("raise", "reorder"):
            raise ValueError(f"late_dim must be 'raise' or 'reorder', got {mode!r}")
        self._builder_late_dim = mode
        return self

    def cost_advisor(
        self, enabled: bool = True, full_query_secs: float | None = None
    ) -> "MVAppBuilder":
        """Measured strategy advisor for AGGREGATE-shaped views: when
        the planner routes to an agg strategy (_ADVISED_STRATEGIES:
        join-agg, plain agg incl. median-class measures, grouping
        sets), time ONE full materialization of the query at build
        (noop sink — count() lets Catalyst prune the measures); if it
        completes within ``full_query_secs`` (default
        ADVISOR_FULL_QUERY_SECS), re-route the view to RecomputeMV —
        per-batch recompute is then predictably cheaper than the
        incremental path's multi-merge floor. The probe is CANCELLED
        at the threshold (job-group cancel): past it the decision is
        already "incremental", and at 100 TB an un-aborted probe is an
        unbounded full scan.

        Calibration (measured, 32-core local, BENCH r8/r9): the star
        join-agg's per-batch recompute is ~0.7x its full-query time,
        while the incremental path's floor is a fixed 2-4s of store
        merges plus a retraction scan that uniform churn degrades to
        O(table) — recompute won at every point measured through sf10
        (full query ~11s; speedups 0.67-0.87). The default threshold
        (15s) therefore routes everything up to ~sf10-scale to
        recompute and trusts O(δ) beyond, where a full join is
        minutes, not seconds. The decision (and the measured time) is
        recorded in describe()['advisor'] — the planner's charter
        applied to cost: a miss is never wrong, only slower.

        Opt-in: the probe costs one full query execution at build, and
        pinned-strategy tests/gates expect the un-advised route."""
        self._cost_advisor = enabled
        self._advisor_threshold = full_query_secs
        return self

    def drop_old_table(self, enabled: bool = True) -> "MVAppBuilder":
        """Wipe any existing target state before the first publish —
        the reference builder's ``setDropOldTable``
        (TiFlinkApp.java:215-218; ``jdbcHelper.dropTable`` in
        ``ensureTargetTable``, TiFlinkApp.java:104-115). At
        :meth:`MVApp.bootstrap` the entire target working directory
        (MV target, fact/state stores, cascade levels) is removed, so
        the bootstrap republishes from the CURRENT sources instead of
        attaching to the previous run's state."""
        self._drop_old_table = enabled
        return self

    def force_new_table(self, enabled: bool = True) -> "MVAppBuilder":
        """Refuse to bootstrap over an existing target — the reference
        builder's ``setForceNewTable`` (TiFlinkApp.java:220-223):
        CREATE TABLE without IF NOT EXISTS, i.e. an already-present
        table is an error unless ``drop_old_table`` removed it first.
        This repo's DEFAULT is the reference's ``false`` spelling
        (CREATE TABLE IF NOT EXISTS): bootstrap over a committed
        target ATTACHES idempotently — the batch-id replay guard the
        crash-recovery contract relies on."""
        self._force_new_table = enabled
        return self

    def validate_pks(self, enabled: bool = True) -> "MVAppBuilder":
        """Assert at bootstrap that every source really is unique on its
        declared PK (one COUNT vs COUNT-DISTINCT aggregate per source —
        a full pass, so opt-in; run it once when onboarding a dataset).
        A falsely-declared PK silently corrupts maintenance: the keyed
        stores MERGE by PK, so duplicate keys collapse into one row and
        every downstream delta is wrong. The reference never faces this
        — it reflects true PKs from the database's own constraints
        (TiJDBCHelper.java:85-109); declared PKs deserve the check the
        database would have enforced."""
        self._validate_pks = enabled
        return self

    def build(self) -> "MVApp":
        if not self._sources or self._query is None or self._target is None:
            raise ValueError("MVApp needs at least one source, a query, and a target")
        return MVApp(
            self._spark,
            self._sources,
            self._query,
            self._target,
            self._pk,
            self._num_buckets,
            self._shuffle_partitions,
            ddl_hook=getattr(self, "_ddl_hook", None),
            validate_pks=getattr(self, "_validate_pks", False),
            column_names=getattr(self, "_column_names", None),
            window_strategy=getattr(self, "_window_strategy", "sort"),
            drop_old_table=getattr(self, "_drop_old_table", False),
            force_new_table=getattr(self, "_force_new_table", False),
            force_recompute=getattr(self, "_force_recompute", False),
            cost_advisor=getattr(self, "_cost_advisor", False),
            advisor_threshold=getattr(self, "_advisor_threshold", None),
            late_dim=getattr(self, "_builder_late_dim", "raise"),
        )


class _SharedMirrorStore:
    """The outer cascade level's mirror of the derived table, aliased
    to the INNER level's target store instead of a second physical
    copy. The inner refresh commits every batch into its target before
    the outer level runs, so the outer's own bootstrap and per-batch
    merge of the alias were pure write amplification: one bootstrap
    write that additionally RE-RAN the whole inner query (the
    placeholder frame), plus one delta write per batch per cascade
    level (measured 0.2–1.3s each at sf0.1 — guide §1.2, remove whole
    jobs). Reads delegate to the shared store with a projection to the
    columns the outer was planned against (the inner target may hold
    engine-internal hidden columns the outer must not see); writes are
    explicit no-ops — the inner level is the single writer. Every
    route already treats ``batch_id in committed_batches()`` as the
    crash-replay signal and reads its pre-batch state via
    ``version_before_batch`` — exactly the semantics a shared,
    already-committed store needs, so the routes run their (tested)
    replay discipline on every batch."""

    def __init__(self, store, cols: list):
        self._store = store
        self._cols = list(cols)

    def __getattr__(self, name):
        return getattr(self._store, name)

    def _project(self, df):
        from tiflink_spark.changelog import OP_COL, SEQ_COL

        by_lower = {c.lower(): c for c in df.columns}
        want = [
            by_lower[c.lower()] for c in self._cols if c.lower() in by_lower
        ]
        have = {w.lower() for w in want}
        tail = [
            c
            for c in df.columns
            if c in (OP_COL, SEQ_COL) and c.lower() not in have
        ]
        if len(want) + len(tail) == len(df.columns):
            return df
        return df.select(*want, *tail)

    def read(self, version=None):
        return self._project(self._store.read(version))

    def read_keys(self, col, vals, version=None):
        return self._project(self._store.read_keys(col, vals, version))

    def read_buckets(self, bucket_ids, version=None, key_filter=None):
        return self._project(
            self._store.read_buckets(
                bucket_ids, version=version, key_filter=key_filter
            )
        )

    def batch_delta(self, batch_id):
        d = self._store.batch_delta(batch_id)
        return None if d is None else self._project(d)

    def bootstrap(self, df, batch_id=0) -> bool:
        return False  # the inner level bootstrapped the shared target

    def merge(self, changes, batch_id) -> bool:
        return False  # the inner level's refresh committed this batch


class CascadeMV:
    """Two-level maintenance for ``SELECT … FROM ( <inner> ) …``: the
    inner query is maintained as its own MV, and the outer query
    consumes the inner target's version diff as a changelog
    (store.changes_between — the store as a CDC source). This is the
    single-SQL form of MV cascading (the reference chains MVs the same
    way: every MV table is itself a TiKV table another TiFlinkApp can
    consume, README.md:8-16; Flink's update-mode planner nests
    update-producing operators directly).

    Both levels must have routed incrementally (the planner bails to
    plain recompute otherwise), so per-batch work is the inner route's
    cost plus the outer route's cost over the DELTA the inner emitted —
    never a full recompute at either level.
    """

    def __init__(self, inner: "MVApp", outer: "MVApp", alias: str):
        self.inner, self.outer, self.alias = inner, outer, alias
        # A grouping-sets outer has no single target store (one keyed
        # store per grouping set) — describe()/introspection tolerate
        # None; reads and versioning go through outer.read().
        self.target = getattr(outer._mv, "target", None)

    def bootstrap(self, batch_id=0) -> None:
        self.inner.bootstrap(batch_id)
        self.outer.bootstrap(batch_id)

    def refresh(self, changes, batch_id) -> bool:
        from tiflink_spark.changelog import OP_COL, SEQ_COL
        from tiflink_spark.store import changes_between

        # Split the batch between the levels: tables the inner route
        # maintains flow into it (their effect reaches the outer as the
        # inner target's version diff); base tables the OUTER references
        # directly (round 7 — e.g. the theta side of a theta-over-equi
        # tree) flow straight to the outer alongside that diff. A table
        # maintained at both levels goes to both — each keeps its own
        # store, both see the same changelog.
        inner_tabs = self.inner.maintained_tables()
        outer_tabs = self.outer.maintained_tables() - {self.alias}
        unknown = set(changes) - inner_tabs - outer_tabs
        if unknown:
            raise ValueError(
                f"cascade MV maintains only {sorted(inner_tabs | outer_tabs)}; "
                f"got changes for {sorted(unknown)}"
            )
        inner_changes = {k: v for k, v in changes.items() if k in inner_tabs}
        outer_changes = {k: v for k, v in changes.items() if k in outer_tabs}
        # A single-target inner cascades through its target store; a
        # multi-store inner (grouping sets) exposes a store-shaped
        # composite façade as `cascade_target`.
        tgt = getattr(self.inner._mv, "cascade_target", None)
        if tgt is None:
            tgt = self.inner._mv.target
        pre = getattr(tgt, "pre_batch_version", None)
        if pre is not None:
            # Composite target: the batch may have committed in SOME
            # per-set stores before a crash. pre_batch_version returns
            # the crash-aware baseline (pre-batch version for committed
            # subs, current for the rest); the inner refresh must still
            # run unless EVERY sub committed, or the uncommitted subs
            # would never see the batch.
            v_from, fully_committed = pre(batch_id)
            if not fully_committed and inner_changes:
                self.inner.refresh(inner_changes, batch_id)
        elif batch_id in tgt.committed_batches():
            # crash replay: the inner committed but (possibly) the outer
            # did not — recover this batch's delta from the version log
            v_from = tgt.version_before_batch(batch_id)
        else:
            v_from = tgt.current_version()
            if inner_changes:
                self.inner.refresh(inner_changes, batch_id)
        v_to = tgt.current_version()
        if v_to != v_from:
            # Project through the inner query's schema PLUS the target's
            # own key columns (a bag inner's hidden branch tag completes
            # the true key the outer stores by); other engine-internal
            # columns (hidden DISTINCT counts etc.) the outer must not see.
            cols = list(
                dict.fromkeys(
                    [f.name for f in self.inner.mv_schema.fields] + list(tgt.pk)
                )
            )
            cb = getattr(tgt, "changes_between", None)
            delta = (
                cb(v_from, v_to)
                if cb is not None
                else changes_between(tgt, v_from, v_to)
            ).select(*cols, OP_COL, SEQ_COL)
            outer_changes = {self.alias: delta, **outer_changes}
        if not outer_changes:
            return False
        return self.outer.refresh(outer_changes, batch_id)

    def read(self, version: int | None = None):
        return self.outer.read(version)


class MVApp:
    @staticmethod
    def builder(spark: SparkSession) -> MVAppBuilder:
        return MVAppBuilder(spark)

    def __init__(
        self, spark, sources, query, target, pk, num_buckets,
        shuffle_partitions=None, ddl_hook=None, validate_pks=False,
        column_names=None, window_strategy="sort",
        drop_old_table=False, force_new_table=False,
        force_recompute=False, cost_advisor=False, advisor_threshold=None,
        late_dim="raise",
    ):
        # temporal-join late-dim policy (see IncrementalTemporalJoinMV:
        # "raise" fails loudly on out-of-order dim versions, "reorder"
        # splices them retroactively)
        self._late_dim = late_dim
        # Output-name override (the reference builder's setColumnNames,
        # README.md:56): planning/maintenance run on the query's own
        # names; _finish_column_names applies the user-facing rename
        # after whichever route's early return built the app.
        self._column_names = None
        self._window_strategy = window_strategy
        # Target lifecycle flags (TiFlinkApp.java:215-223); applied at
        # bootstrap() — building an MVApp plans, it does not write.
        self.drop_old_table = drop_old_table
        self.force_new_table = force_new_table
        self.advisor = None
        self._plan(
            spark, sources, query, target, pk, num_buckets,
            shuffle_partitions, ddl_hook, validate_pks,
            force_recompute=force_recompute,
        )
        if (
            cost_advisor
            and not force_recompute
            and self.maintenance_strategy in _ADVISED_STRATEGIES
        ):
            # Measured advisor (see MVAppBuilder.cost_advisor): one
            # timed full materialization of the (already-normalized)
            # query, aborted at the threshold; below it, per-batch
            # recompute is predictably cheaper than the incremental
            # path's merge floor, so re-plan onto RecomputeMV.
            thr = (
                advisor_threshold
                if advisor_threshold is not None
                else ADVISOR_FULL_QUERY_SECS
            )
            t_full, aborted = _timed_full_execution(
                spark, spark.sql(spark_executable_query(self.query)), thr
            )
            decision = (
                "recompute" if not aborted and t_full <= thr else "incremental"
            )
            self.advisor = {
                # None when aborted: the probe was cancelled AT the
                # threshold, so the true full-query time is unknown
                # (only that it exceeds thr)
                "full_query_secs": None if aborted else round(t_full, 3),
                "threshold_secs": thr,
                "aborted": aborted,
                "strategy": self.maintenance_strategy,
                "decision": decision,
            }
            if decision == "recompute":
                self._plan(
                    spark, sources, query, target, pk, num_buckets,
                    shuffle_partitions, ddl_hook, validate_pks,
                    force_recompute=True,
                )
        if column_names is not None:
            self._finish_column_names(column_names, target)

    def _finish_column_names(self, names, target):
        orig = [f.name for f in self.mv_schema.fields]
        if len(names) != len(orig):
            raise ValueError(
                f"column_names has {len(names)} names for {len(orig)} "
                f"output columns {orig}"
            )
        self._orig_out_names = orig
        self._column_names = list(names)
        from pyspark.sql.types import StructField, StructType

        self.mv_schema = StructType(
            [StructField(n, f.dataType, f.nullable) for n, f in zip(names, self.mv_schema.fields)]
        )
        lower = [c.lower() for c in orig]
        try:
            renamed_pk = [names[lower.index(p.lower())] for p in self.mv_pk]
        except ValueError:
            # PK column not in the visible output (hidden engine key):
            # advertise the rename positionally-unmapped DDL without it
            renamed_pk = list(self.mv_pk)
        self.ddl = create_table_ddl(os.path.basename(target), self.mv_schema, renamed_pk)

    def _plan(
        self, spark, sources, query, target, pk, num_buckets,
        shuffle_partitions=None, ddl_hook=None, validate_pks=False,
        force_recompute=False,
    ):
        self.spark = spark
        self.catalog = Catalog(spark)
        self.query = query
        self._ddl_hook = ddl_hook
        self._validate_pks = validate_pks
        self.target_path = target
        self._stores: dict[str, KeyedParquetStore] = {}
        # True when the MV class takes a {table: changes} dict refresh
        # (multi-table maintenance: join-agg trees, union-all)
        self._dict_refresh = False
        # (alias, expr) columns derived onto fact changelog batches
        # (computed group keys); set by the agg route
        self._derive: list[tuple[str, str]] = []

        dfs: dict[str, tuple] = {}
        self._source_event_time: dict[str, str | None] = {}
        for name, value in sources.items():
            src, spk, *more = value
            self._source_event_time[name] = more[0] if more else None
            if isinstance(src, str):
                from tiflink_spark.session import read_parquet_normalized

                spec = self.catalog.register_parquet(name, src, spk)
                df = read_parquet_normalized(self.spark, src)
            else:
                spec = self.catalog.register_dataframe(name, src, spk)
                df = src
            dfs[name] = (spec, df)
        # kept for bootstrap-time PK validation (validate_pks)
        self._source_frames = {n: (d[0].pk, d[1]) for n, d in dfs.items()}

        # FOR SYSTEM_TIME AS OF (temporal/versioned dim join) routes
        # through its own planner branch BEFORE normalization and the
        # Spark resolve probe — Spark SQL cannot parse the syntax, so
        # there is no recompute fallback to degrade to.
        if re.search(r"(?i)\bSYSTEM_TIME\b", query):
            # Flink's PROCESSING-TIME form — FOR SYSTEM_TIME AS OF
            # PROCTIME() — joins the dim's CURRENT state: for a
            # maintained MV that is exactly the lookup-enrichment
            # route (dim churn re-derives the matching fact rows), so
            # strip the clause and fall through to normal planning.
            # Only the event-time form needs versioned dim history.
            plain_pt, n_pt = re.subn(
                r"(?is)\bFOR\s+SYSTEM_TIME\s+AS\s+OF\s+PROCTIME\s*\(\s*\)",
                " ",
                query,
            )
            if n_pt:
                query = plain_pt
            else:
                self._plan_temporal(
                    spark, dfs, query, target, pk, num_buckets, shuffle_partitions
                )
                return

        # Whether the advertised MV PK is a TRUE unique constraint of
        # the result. Every incremental route derives a real key (group
        # keys, fact PK, …) EXCEPT union-all, whose per-branch key can
        # repeat across branches (the hidden __src tag is the real
        # carrier). A cascade must not build on an overclaimed inner
        # key: the outer's retraction state would collapse distinct
        # rows that share it (see the cascade probe below).
        self.pk_is_unique = True

        # Normalize before planning: semantics-preserving rewrites
        # (CTE inlining, comma-join -> JOIN ON, GROUP BY / ORDER BY
        # ordinals, RIGHT->LEFT join, bare ORDER BY removal) widen
        # every matcher's reach; the rewritten text is what the
        # recompute fallback executes too, so a rewrite is never a
        # correctness risk (planner.normalize_query).
        query = normalize_query(
            query, {n: [f.name for f in d[1].schema.fields] for n, d in dfs.items()}
        )
        self.query = query

        # Resolve the query against the catalog: schema + PK inference.
        # (spark_executable_query: subset-GROUPING_ID -> grouping()
        # arithmetic; Spark's analyzer rejects the subset form the
        # engine's SQL surface accepts.)
        resolved = spark.sql(spark_executable_query(query))
        self.mv_schema = resolved.schema
        self.mv_pk = default_pk(self.mv_schema, pk)
        self._declared_pk = pk
        self.ddl = create_table_ddl(os.path.basename(target), self.mv_schema, self.mv_pk)

        # Explicit escape hatch (builder.force_recompute()): skip every
        # incremental probe — for A/B-measuring incremental maintenance
        # against the recompute baseline (bench.py's mv_refresh block)
        # and for pinning a view to recompute when its churn profile
        # makes that the cheaper plan (full-table rewrites per batch).
        if force_recompute:
            self._setup_recompute(
                spark, dfs, query, target, num_buckets, shuffle_partitions
            )
            return

        # Maintenance-strategy planning (planner.py): the canonical
        # single-table aggregate shape gets true incremental maintenance
        # (per-batch work ∝ changed keys); everything else falls back to
        # recompute with a change-bounded sink. The incremental route
        # needs a fact PK (retraction lookups) and an undeclared-or-
        # matching MV PK (a GROUP BY's key set is the derived unique
        # constraint, the reference's first PK-inference rule,
        # TiFlinkApp.java:276-281).
        source_columns = {n: [f.name for f in d[1].schema.fields] for n, d in dfs.items()}
        shape = match_agg_shape(query, set(dfs), source_columns)
        spec = dfs[shape.fact][0] if shape is not None else None
        if (
            shape is not None
            and spec.pk
            and (pk is None or list(pk) == list(shape.group_keys))
        ):
            self.maintenance_mode = "incremental"
            self._fact_name, self._dim_name = shape.fact, None
            self._join_names = None
            # A row-local WHERE stays incremental via the stateless-
            # filter changelog rule: filtered bootstrap + apply_filter
            # on every fact batch (rows leaving the predicate -> -D).
            # Computed group keys (GROUP BY date_trunc(...) AS day) are
            # derived onto the fact rows the same way — bootstrap here,
            # every changelog batch in refresh() — after which they
            # behave exactly like stored columns.
            self._change_filter = shape.where
            self._derive = list(shape.key_exprs)
            fact_df = dfs[shape.fact][1]
            from pyspark.sql import functions as F

            for alias, expr in self._derive:
                fact_df = fact_df.withColumn(alias, F.expr(expr))
            if shape.where is not None:
                fact_df = fact_df.filter(F.expr(shape.where))
            self.mv_pk = list(shape.group_keys)
            # The planner refined the PK (full group-key set); the DDL
            # must advertise the same constraint the store enforces.
            self.ddl = create_table_ddl(os.path.basename(target), self.mv_schema, self.mv_pk)
            self._mv = IncrementalAggMV(
                spark,
                fact_df,
                spec.pk,
                list(shape.group_keys),
                list(shape.measures),
                work_dir=target,
                num_buckets=num_buckets,
                shuffle_partitions=shuffle_partitions,
                target_filter=shape.having,
            )
            # The incremental MV's own fact store IS the source store.
            self._stores = {shape.fact: self._mv.fact_store}
            return

        # GROUPING SETS / ROLLUP / CUBE — the multi-grain reporting
        # aggregate, maintained by decomposition into one aggregate
        # state per grouping set over a SHARED fact store (SURVEY §2.2
        # "expand to union of aggs"; the reference gets these from
        # Flink's Expand node, TiFlinkApp.java:270). The view is a bag
        # union (subtotal rows carry NULL keys), so no PK declaration
        # is accepted and pk_is_unique turns off (no cascades on top).
        gs = match_grouping_sets_shape(query, set(dfs), source_columns)
        if gs is not None and dfs[gs.fact][0].pk and pk is None:
            from pyspark.sql import functions as F
            from tiflink_spark.mv import IncrementalGroupingSetsMV

            self.maintenance_mode = "incremental"
            self._fact_name, self._dim_name = gs.fact, None
            self._join_names = None
            self._change_filter = gs.where
            # Computed grouping keys (ROLLUP(date_trunc(...) AS mon))
            # derive onto fact rows — bootstrap here, every changelog
            # batch in refresh() — after which the sub-MVs see them as
            # stored columns (same mechanism as the flat-agg route).
            self._derive = list(gs.key_exprs)
            fact_df = dfs[gs.fact][1]
            for alias, expr in self._derive:
                fact_df = fact_df.withColumn(alias, F.expr(expr))
            if gs.where is not None:
                fact_df = fact_df.filter(F.expr(gs.where))
            self.pk_is_unique = False
            self._mv = IncrementalGroupingSetsMV(
                spark,
                fact_df,
                dfs[gs.fact][0].pk,
                list(gs.all_keys),
                list(gs.sets),
                list(gs.measures),
                work_dir=target,
                num_buckets=num_buckets,
                shuffle_partitions=shuffle_partitions,
                grouping_items=list(gs.grouping_items),
                gid_items=list(gs.gid_items),
                tail_order=list(gs.tail_order),
                target_filter=gs.having,
                hidden_measures=list(gs.hidden),
                having_gcalls=list(gs.having_gcalls),
            )
            self._stores = {gs.fact: self._mv.fact_store}
            return

        # Global (no GROUP BY) aggregate — the dashboard-total MV.
        # Routed to IncrementalAggMV keyed by a derived constant; the
        # one row survives table emptiness at its zero state (COUNT 0,
        # SUM/MIN/MAX NULL — SQL's empty-input global aggregate). The
        # advertised MV PK stays the first-output-column fallback (the
        # reference's rule for keyless outputs, TiFlinkApp.java:276-281);
        # the hidden "__g" key is the real store address and never
        # reaches the query schema.
        ga = match_global_agg_shape(query, set(dfs), source_columns)
        if ga is not None and dfs[ga.fact][0].pk and pk is None:
            from pyspark.sql import functions as F

            self.maintenance_mode = "incremental"
            self._fact_name, self._dim_name = ga.fact, None
            self._join_names = None
            self._change_filter = ga.where
            self._derive = [("__g", "0")]
            fact_df = dfs[ga.fact][1].withColumn("__g", F.lit(0))
            if ga.where is not None:
                fact_df = fact_df.filter(F.expr(ga.where))
            self._mv = IncrementalAggMV(
                spark,
                fact_df,
                dfs[ga.fact][0].pk,
                ["__g"],
                list(ga.measures),
                work_dir=target,
                num_buckets=num_buckets,
                shuffle_partitions=shuffle_partitions,
                global_group=True,
            )
            self._stores = {ga.fact: self._mv.fact_store}
            return

        # SELECT DISTINCT — the dedup view, maintained as a hidden
        # COUNT(*)-per-key aggregate: a key's first arrival inserts the
        # MV row, its last departure deletes it (the count-based
        # DISTINCT maintenance of every update-mode planner). read()
        # projects the hidden count away via mv_schema.
        ds = match_distinct_shape(query, set(dfs), source_columns)
        spec = dfs[ds.fact][0] if ds is not None else None
        if (
            ds is not None
            and spec.pk
            and (pk is None or list(pk) == list(ds.cols))
        ):
            self.maintenance_mode = "incremental"
            self._fact_name, self._dim_name = ds.fact, None
            self._join_names = None
            self._change_filter = ds.where
            fact_df = dfs[ds.fact][1]
            if ds.where is not None:
                from pyspark.sql import functions as F

                fact_df = fact_df.filter(F.expr(ds.where))
            self.mv_pk = list(ds.cols)
            self.ddl = create_table_ddl(os.path.basename(target), self.mv_schema, self.mv_pk)
            self._mv = IncrementalAggMV(
                spark,
                fact_df,
                spec.pk,
                list(ds.cols),
                [Measure("count", None, "__cnt")],
                work_dir=target,
                num_buckets=num_buckets,
                shuffle_partitions=shuffle_partitions,
            )
            self._stores = {ds.fact: self._mv.fact_store}
            return

        # The canonical star/snowflake-join aggregate (fact ⋈ dims
        # GROUP BY) — the shape behind every TPC-H-like MV, which the
        # reference gets incrementally from Flink's update-mode planner
        # (TiFlinkApp.java:270). Dirty-join-key re-derivation of the
        # joined relation feeds the aggregate state merge; changelogs on
        # ALL sides maintain the view with work ∝ touched keys.
        ja = match_join_agg_shape(
            query, set(dfs), source_columns, {n: d[0].pk for n, d in dfs.items()}
        )
        if (
            ja is not None
            and dfs[ja.fact][0].pk
            and (pk is None or list(pk) == list(ja.group_keys))
        ):
            self.maintenance_mode = "incremental"
            self._fact_name, self._dim_name = ja.fact, None
            self._join_names = self._change_filter = None
            self._dict_refresh = True
            self._ja_tables = {ja.fact, *(d.dim for d in ja.dims)}
            self.mv_pk = list(ja.group_keys)
            self.ddl = create_table_ddl(os.path.basename(target), self.mv_schema, self.mv_pk)
            self._mv = IncrementalJoinAggMV(
                spark,
                fact_name=ja.fact,
                fact=dfs[ja.fact][1],
                fact_pk=dfs[ja.fact][0].pk,
                dims=list(ja.dims),
                dim_dfs={d.dim: dfs[d.dim][1] for d in ja.dims},
                group_keys=list(ja.group_keys),
                measures=list(ja.measures),
                fact_cols=list(ja.fact_cols),
                work_dir=target,
                where=ja.where,
                num_buckets=num_buckets,
                shuffle_partitions=shuffle_partitions,
                target_filter=ja.having,
                key_exprs=list(ja.key_exprs),
            )
            self._stores = {
                ja.fact: self._mv.fact_store,
                **{d.dim: self._mv.dim_stores[d.dim] for d in ja.dims},
            }
            return

        # The reference's flagship shape — correlated scalar COUNT over a
        # dimension (TiFlinkExample.java:10-16) — decorrelates to the
        # dim-joined IncrementalAggMV: changelogs on the fact AND the dim
        # maintain the view with work ∝ changed keys.
        corr = match_correlated_count_shape(
            query, set(dfs), {n: d[0].pk for n, d in dfs.items()}, source_columns
        )
        if (
            corr is not None
            and dfs[corr.fact][0].pk
            and (pk is None or list(pk) == [corr.dim_key])
        ):
            self.maintenance_mode = "incremental"
            from pyspark.sql import functions as F

            self._fact_name, self._dim_name = corr.fact, corr.dim
            self._join_names = None
            # A NULL fact FK equality-matches no dim row, so it can
            # never contribute to any group — and it would crash the
            # fk-keyed aggregate state store. Drop such rows at
            # bootstrap AND per batch (the stateless changelog filter
            # demotes a row UPDATING to NULL fk to -D, retracting its
            # old group contribution). Round 10 — found by the scalar
            # theta battery's NULL-key frames.
            self._change_filter = f"{corr.fact_key} IS NOT NULL"
            self.mv_pk = [corr.dim_key]
            # PK refined to the dim key (the derived unique constraint).
            self.ddl = create_table_ddl(os.path.basename(target), self.mv_schema, self.mv_pk)
            self._mv = IncrementalAggMV(
                spark,
                dfs[corr.fact][1].filter(F.expr(self._change_filter)),
                dfs[corr.fact][0].pk,
                corr.fact_key,
                [Measure(corr.agg_kind, corr.agg_col, corr.alias)],
                work_dir=target,
                dim=dfs[corr.dim][1],
                dim_key=corr.dim_key,
                dim_cols=list(corr.dim_cols),
                num_buckets=num_buckets,
                shuffle_partitions=shuffle_partitions,
            )
            self._stores = {
                corr.fact: self._mv.fact_store,
                corr.dim: self._mv.dim_store,
            }
            return

        # Theta-correlated SCALAR aggregate (round 10): the flagship
        # shape widened past its single fk = pk equality. Per-row sets
        # cannot decorrelate to a keyed GROUP BY, so the aggregate is
        # evaluated exactly per dirty dim row over one theta join
        # (IncrementalCorrScalarAggMV); fact churn re-evaluates only
        # dim rows in theta range of the changed rows' old/new values.
        cagg = match_corr_scalar_shape(
            query, set(dfs), {n: d[0].pk for n, d in dfs.items()}, source_columns
        )
        if (
            cagg is not None
            and dfs[cagg.fact][0].pk
            and (pk is None or list(pk) == [cagg.dim_pk])
        ):
            from tiflink_spark.mv import IncrementalCorrScalarAggMV

            self.maintenance_mode = "incremental"
            self._fact_name = self._dim_name = self._change_filter = None
            self._join_names = (cagg.fact, cagg.dim)
            self.mv_pk = [cagg.dim_pk]
            self.ddl = create_table_ddl(
                os.path.basename(target), self.mv_schema, self.mv_pk
            )
            self._mv = IncrementalCorrScalarAggMV(
                spark,
                dim=dfs[cagg.dim][1],
                dim_pk=dfs[cagg.dim][0].pk,
                fact=dfs[cagg.fact][1],
                fact_pk=dfs[cagg.fact][0].pk,
                akind=cagg.akind,
                acol=cagg.acol,
                alias=cagg.alias,
                corr=list(cagg.corr),
                out_cols=list(cagg.out_cols),
                work_dir=target,
                num_buckets=num_buckets,
                shuffle_partitions=shuffle_partitions,
                inner_where=cagg.inner_where,
            )
            self._stores = {
                cagg.fact: self._mv.fact_store,
                cagg.dim: self._mv.dim_store,
            }
            return

        # Correlated-existence filter — EXISTS / NOT EXISTS / IN
        # subquery — the streaming semi/anti join Flink's update-mode
        # planner maintains with presence state per key. Fact-side
        # changes re-evaluate exactly the changed PKs; other-side
        # changes re-evaluate only the fact rows holding the dirty key
        # values. The fact PK must be selected (the MV is keyed by it).
        sj = match_semijoin_shape(query, set(dfs), source_columns)
        if sj is not None:
            fspec, ospec = dfs[sj.fact][0], dfs[sj.other][0]
            sel_lower = {c.lower() for c in sj.out_cols}
            # NOT IN (null_aware) works on ANY inner column, PK or not:
            # the MV maintains the inner's null-presence bit explicitly
            # (an inner NULL empties the view; its appearance/
            # disappearance re-evaluates every fact row — inherent to
            # NOT IN semantics).
            if (
                fspec.pk
                and ospec.pk
                and all(p.lower() in sel_lower for p in fspec.pk)
                and (pk is None or list(pk) == list(fspec.pk))
            ):
                from tiflink_spark.mv import IncrementalSemiJoinMV

                self.maintenance_mode = "incremental"
                self._fact_name = self._dim_name = self._change_filter = None
                self._join_names = (sj.fact, sj.other)
                self.mv_pk = list(fspec.pk)
                self.ddl = create_table_ddl(
                    os.path.basename(target), self.mv_schema, self.mv_pk
                )
                self._mv = IncrementalSemiJoinMV(
                    spark,
                    fact=dfs[sj.fact][1],
                    fact_pk=fspec.pk,
                    other=dfs[sj.other][1],
                    other_pk=ospec.pk,
                    fact_key=list(sj.fact_keys),
                    other_key=list(sj.other_keys),
                    out_cols=list(sj.out_cols),
                    work_dir=target,
                    anti=sj.anti,
                    num_buckets=num_buckets,
                    shuffle_partitions=shuffle_partitions,
                    where=sj.where,
                    null_aware=sj.null_aware,
                )
                self._stores = {
                    sj.fact: self._mv.fact_store,
                    sj.other: self._mv.other_store,
                }
                return

        # Filtered / CORRELATED IN-subquery (round 10): the inner
        # SELECT carries its own WHERE. Row-local inner conjuncts keep
        # the presence-state class with the filter applied to the inner
        # store; correlated comparison terms (the r9 'NOT IN with
        # correlated non-equality predicates' recompute tail) switch to
        # exact per-outer-row membership (IncrementalCorrSemiJoinMV —
        # no global key state exists when S(c) varies per row).
        cs = match_corr_semijoin_shape(query, set(dfs), source_columns)
        if cs is not None:
            fspec, ospec = dfs[cs.fact][0], dfs[cs.other][0]
            sel_lower = {c.lower() for c in cs.out_cols}
            if (
                fspec.pk
                and ospec.pk
                and all(p.lower() in sel_lower for p in fspec.pk)
                and (pk is None or list(pk) == list(fspec.pk))
            ):
                self.maintenance_mode = "incremental"
                self._fact_name = self._dim_name = self._change_filter = None
                self._join_names = (cs.fact, cs.other)
                self.mv_pk = list(fspec.pk)
                self.ddl = create_table_ddl(
                    os.path.basename(target), self.mv_schema, self.mv_pk
                )
                if cs.corr:
                    from tiflink_spark.mv import IncrementalCorrSemiJoinMV

                    self._mv = IncrementalCorrSemiJoinMV(
                        spark,
                        fact=dfs[cs.fact][1],
                        fact_pk=fspec.pk,
                        other=dfs[cs.other][1],
                        other_pk=ospec.pk,
                        fact_key=cs.fact_key,
                        other_key=cs.other_key,
                        corr=list(cs.corr),
                        out_cols=list(cs.out_cols),
                        work_dir=target,
                        anti=cs.anti,
                        num_buckets=num_buckets,
                        shuffle_partitions=shuffle_partitions,
                        where=cs.where,
                        inner_where=cs.inner_where,
                    )
                else:
                    from tiflink_spark.mv import IncrementalSemiJoinMV

                    self._mv = IncrementalSemiJoinMV(
                        spark,
                        fact=dfs[cs.fact][1],
                        fact_pk=fspec.pk,
                        other=dfs[cs.other][1],
                        other_pk=ospec.pk,
                        fact_key=cs.fact_key,
                        other_key=cs.other_key,
                        out_cols=list(cs.out_cols),
                        work_dir=target,
                        anti=cs.anti,
                        num_buckets=num_buckets,
                        shuffle_partitions=shuffle_partitions,
                        where=cs.where,
                        null_aware=cs.anti,
                        other_where=cs.inner_where,
                    )
                self._stores = {
                    cs.fact: self._mv.fact_store,
                    cs.other: self._mv.other_store,
                }
                return

        # Theta-EXISTS (round 10): [NOT] EXISTS whose correlation mixes
        # equalities with non-equality comparisons (or has none) — past
        # the pure-equality presence-state matcher above. Membership is
        # bare per-row non-emptiness, evaluated exactly per dirty row;
        # equality conjuncts ride as '=' theta terms so Catalyst can
        # still hash-join on them with the theta residual attached.
        ce = match_corr_exists_shape(query, set(dfs), source_columns)
        if ce is not None:
            fspec, ospec = dfs[ce.fact][0], dfs[ce.other][0]
            sel_lower = {c.lower() for c in ce.out_cols}
            if (
                fspec.pk
                and ospec.pk
                and all(p.lower() in sel_lower for p in fspec.pk)
                and (pk is None or list(pk) == list(fspec.pk))
            ):
                from tiflink_spark.mv import IncrementalCorrSemiJoinMV

                self.maintenance_mode = "incremental"
                self._fact_name = self._dim_name = self._change_filter = None
                self._join_names = (ce.fact, ce.other)
                self.mv_pk = list(fspec.pk)
                self.ddl = create_table_ddl(
                    os.path.basename(target), self.mv_schema, self.mv_pk
                )
                self._mv = IncrementalCorrSemiJoinMV(
                    spark,
                    fact=dfs[ce.fact][1],
                    fact_pk=fspec.pk,
                    other=dfs[ce.other][1],
                    other_pk=ospec.pk,
                    fact_key=None,
                    other_key=None,
                    corr=list(ce.corr),
                    out_cols=list(ce.out_cols),
                    work_dir=target,
                    anti=ce.anti,
                    num_buckets=num_buckets,
                    shuffle_partitions=shuffle_partitions,
                    where=ce.where,
                    inner_where=ce.inner_where,
                    exists_mode=True,
                )
                self._stores = {
                    ce.fact: self._mv.fact_store,
                    ce.other: self._mv.other_store,
                }
                return

        # Bare two-sided equi-join (USING or ON form): dirty-join-key
        # recompute with changelogs on both sides (IncrementalJoinMV).
        # The MV PK is the concatenated source PKs; they must all be in
        # the select list so the MV schema matches the query's.
        join = match_join_shape(query, set(dfs), source_columns)
        if join is not None:
            (lspec, ldf), (rspec, rdf) = dfs[join.left], dfs[join.right]
            target_pk = [*lspec.pk, *rspec.pk]
            sel_lower = {c.lower() for c in join.out_cols}
            if (
                lspec.pk
                and rspec.pk
                and all(c.lower() in sel_lower for c in target_pk)
                and (pk is None or list(pk) == target_pk)
            ):
                self.maintenance_mode = "incremental"
                self._fact_name = self._dim_name = self._change_filter = None
                self._join_names = (join.left, join.right)
                self.mv_pk = target_pk
                self.ddl = create_table_ddl(os.path.basename(target), self.mv_schema, self.mv_pk)
                self._mv = IncrementalJoinMV(
                    spark,
                    left=ldf,
                    left_pk=lspec.pk,
                    right=rdf,
                    right_pk=rspec.pk,
                    join_key=(
                        (join.join_key, join.right_key)
                        if join.right_key is not None
                        else join.join_key
                    ),
                    out_cols=list(join.out_cols),
                    work_dir=target,
                    num_buckets=num_buckets,
                    shuffle_partitions=shuffle_partitions,
                    where=join.where,
                )
                self._stores = {
                    join.left: self._mv.left_store,
                    join.right: self._mv.right_store,
                }
                return

        # Two-sided NON-EQUI join view (interval bands, BETWEEN,
        # inequalities, arbitrary theta) — dirty-PK recompute over both
        # post-merge states: the change-bounded version of the inherent
        # non-equi cost (Flink keeps both sides' full state and probes
        # per record for the same reason, by delegation
        # TiFlinkApp.java:270). Tried after the equi matchers.
        tj = match_theta_join_shape(
            query, set(dfs), source_columns, {n: d[0].pk for n, d in dfs.items()}
        )
        if tj is not None:
            lspec, rspec = dfs[tj.left][0], dfs[tj.right][0]
            target_pk = [*lspec.pk, *rspec.pk]
            if pk is None or list(pk) == target_pk:
                from tiflink_spark.mv import IncrementalThetaJoinMV

                self.maintenance_mode = "incremental"
                self._fact_name = self._dim_name = self._change_filter = None
                self._join_names = (tj.left, tj.right)
                self.mv_pk = target_pk
                self.ddl = create_table_ddl(
                    os.path.basename(target), self.mv_schema, self.mv_pk
                )
                self._mv = IncrementalThetaJoinMV(
                    spark,
                    left=dfs[tj.left][1],
                    left_pk=lspec.pk,
                    right=dfs[tj.right][1],
                    right_pk=rspec.pk,
                    predicate=tj.predicate,
                    out_cols=list(tj.out_cols),
                    work_dir=target,
                    num_buckets=num_buckets,
                    shuffle_partitions=shuffle_partitions,
                )
                self._stores = {
                    tj.left: self._mv.left_store,
                    tj.right: self._mv.right_store,
                }
                return

        # FULL OUTER equi-join view — both sides preserved. Flink's
        # update-mode planner maintains this natively (NULL-extension
        # retracted when the other side arrives); here the route is
        # dirty-key recompute + diff over a synthetic row identity,
        # keyed by that identity because dim-only rows carry NULL fact
        # PKs. The visible output has no unique column (pk_is_unique
        # off, same overclaim as the union route).
        fo = match_full_outer_shape(
            query, set(dfs), source_columns, {n: d[0].pk for n, d in dfs.items()}
        )
        if fo is not None and pk is None:
            from tiflink_spark.mv import IncrementalFullOuterJoinMV

            self.maintenance_mode = "incremental"
            self._fact_name = self._dim_name = self._change_filter = None
            self._join_names = (fo.fact, fo.dim)
            self.pk_is_unique = False
            self.mv_pk = list(dfs[fo.fact][0].pk)
            self.ddl = create_table_ddl(
                os.path.basename(target), self.mv_schema, self.mv_pk
            )
            self._mv = IncrementalFullOuterJoinMV(
                spark,
                fact=dfs[fo.fact][1],
                fact_pk=dfs[fo.fact][0].pk,
                dim=dfs[fo.dim][1],
                dim_keys=list(fo.dim_keys),
                fact_fks=list(fo.fact_fks),
                out_cols=list(fo.out_cols),
                work_dir=target,
                num_buckets=num_buckets,
                shuffle_partitions=shuffle_partitions,
                where=fo.where,
            )
            self._stores = {
                fo.fact: self._mv.fact_store,
                fo.dim: self._mv.dim_store,
            }
            return

        # Lookup-enrichment view — the joined relation itself, keyed by
        # the fact PK (orders carrying their customer's name): fact
        # [LEFT] JOIN dims with every dim entering through its declared
        # PK. Tried after the two-sided bare join (which also handles
        # M:N edges); this route adds LEFT dims, snowflake chains,
        # composite keys, and derived row-local expressions.
        jp = match_join_projection_shape(
            query, set(dfs), source_columns, {n: d[0].pk for n, d in dfs.items()}
        )
        if (
            jp is not None
            and dfs[jp.fact][0].pk
            and (pk is None or list(pk) == list(dfs[jp.fact][0].pk))
        ):
            from tiflink_spark.mv import IncrementalJoinProjectionMV

            self.maintenance_mode = "incremental"
            self._fact_name, self._dim_name = None, None
            self._join_names = self._change_filter = None
            self._dict_refresh = True
            self._ja_tables = {jp.fact, *(d.dim for d in jp.dims)}
            self.mv_pk = list(dfs[jp.fact][0].pk)
            self.ddl = create_table_ddl(
                os.path.basename(target), self.mv_schema, self.mv_pk
            )
            self._mv = IncrementalJoinProjectionMV(
                spark,
                fact_name=jp.fact,
                fact=dfs[jp.fact][1],
                fact_pk=dfs[jp.fact][0].pk,
                dims=list(jp.dims),
                dim_dfs={d.dim: dfs[d.dim][1] for d in jp.dims},
                group_keys=[],
                measures=[],
                fact_cols=list(jp.fact_cols),
                work_dir=target,
                where=jp.where,
                num_buckets=num_buckets,
                shuffle_partitions=shuffle_partitions,
                key_exprs=list(jp.key_exprs),
                out_cols=list(jp.out_cols),
            )
            self._stores = {
                jp.fact: self._mv.fact_store,
                **{d.dim: self._mv.dim_stores[d.dim] for d in jp.dims},
            }
            return

        # Bare multi-branch UNION ALL — the multi-source ingestion
        # view, stateless under changelogs: each branch's changes
        # project straight into the target keyed by (branch tag, PK).
        # The hidden tag is the real uniqueness carrier; the advertised
        # MV PK (the shared key column) is unique only per branch — the
        # same first-column PK overclaim the reference makes for
        # non-unique query outputs (TiFlinkApp.java:276-281). Publish
        # targets whose branches can collide on the key need their own
        # DDL without the PK constraint.
        ua = match_union_all_shape(
            query, set(dfs), source_columns, {n: d[0].pk for n, d in dfs.items()}
        )
        if ua is not None and pk is None:
            from tiflink_spark.mv import IncrementalUnionMV

            self.maintenance_mode = "incremental"
            self._fact_name = self._dim_name = None
            self._join_names = self._change_filter = None
            self._dict_refresh = True
            self._ja_tables = {t for t, _ in ua.branches}
            # first-column-style PK overclaim: unique per branch only
            self.pk_is_unique = False
            self.mv_pk = [ua.out_cols[ua.key_pos]]
            self.ddl = create_table_ddl(
                os.path.basename(target), self.mv_schema, self.mv_pk
            )
            wheres = dict(zip([t for t, _ in ua.branches], ua.wheres or ()))
            self._mv = IncrementalUnionMV(
                spark,
                branches={
                    t: (dfs[t][1], dfs[t][0].pk[0], list(cols))
                    for t, cols in ua.branches
                },
                out_cols=list(ua.out_cols),
                key_pos=ua.key_pos,
                work_dir=target,
                num_buckets=num_buckets,
                shuffle_partitions=shuffle_partitions,
                wheres=wheres,
            )
            self._stores = {}
            return

        # Two-branch INTERSECT/EXCEPT (set semantics): dual hidden
        # count-per-tuple state, membership re-evaluated only for the
        # tuples a batch touches.
        so = match_setop_shape(
            query, set(dfs), source_columns, {n: d[0].pk for n, d in dfs.items()}
        )
        _bag_op = so is not None and so.op in ("intersect_all", "except_all")
        if so is not None and (
            (pk is None) if _bag_op else (pk is None or list(pk) == list(so.out_cols))
        ):
            from tiflink_spark.mv import IncrementalSetOpMV

            self.maintenance_mode = "incremental"
            self._fact_name = self._dim_name = None
            self._join_names = self._change_filter = None
            self._dict_refresh = True
            self._ja_tables = {so.left, so.right}
            if _bag_op:
                # bag semantics: the view holds duplicate rows, so the
                # tuple is NOT a unique constraint — first-column PK
                # overclaim, same as UNION ALL (TiFlinkApp.java:276-281)
                self.pk_is_unique = False
            else:
                self.mv_pk = list(so.out_cols)
            self.ddl = create_table_ddl(
                os.path.basename(target), self.mv_schema, self.mv_pk
            )
            self._mv = IncrementalSetOpMV(
                spark,
                op=so.op,
                left=dfs[so.left][1],
                left_pk=dfs[so.left][0].pk,
                right=dfs[so.right][1],
                right_pk=dfs[so.right][0].pk,
                left_cols=list(so.left_cols),
                right_cols=list(so.right_cols),
                out_cols=list(so.out_cols),
                work_dir=target,
                num_buckets=num_buckets,
                shuffle_partitions=shuffle_partitions,
                side_names=(so.left, so.right),
                wheres=(so.left_where, so.right_where),
            )
            self._stores = {
                so.left: self._mv._sides["a"].fact_store,
                so.right: self._mv._sides["b"].fact_store,
            }
            return

        # Per-group Top-N (the ROW_NUMBER <= k pattern Flink's
        # update-mode planner special-cases as its Top-N operator) —
        # routed to dirty-group re-ranking over the FULL user order
        # spec. Determinism: the window's ORDER BY column set must
        # cover the fact PK (provably total per partition); without a
        # total order, rank slots on ties are ambiguous.
        tn = match_topn_shape(query, set(dfs), source_columns)
        if tn is not None:
            spec = dfs[tn.fact][0]
            # determinism rule: the rank window's ORDER BY column set
            # must COVER the fact PK (provably total per partition) —
            # ORDER BY the PK itself counts, same rule as the per-row
            # window route. The MV ranks by the FULL user spec (+ a
            # no-op trailing PK), so mid-spec tie columns are honored.
            order_cols = {tn.order_col.lower(), *(c.lower() for c in tn.tie)}
            tie_ok = spec.pk and {p.lower() for p in spec.pk} <= order_cols
            if tie_ok and (
                pk is None or list(pk) == [tn.group_key, tn.rank_alias]
            ):
                self.maintenance_mode = "incremental"
                self._fact_name, self._dim_name = tn.fact, None
                self._join_names = None
                # rows filtered before ranking: filtered bootstrap +
                # the stateless changelog filter rule per batch
                self._change_filter = tn.where
                fact_df = dfs[tn.fact][1]
                if tn.where is not None:
                    from pyspark.sql import functions as F

                    fact_df = fact_df.filter(F.expr(tn.where))
                self.mv_pk = [tn.group_key, tn.rank_alias]
                self.ddl = create_table_ddl(
                    os.path.basename(target), self.mv_schema, self.mv_pk
                )
                self._mv = IncrementalTopKMV(
                    spark,
                    fact=fact_df,
                    fact_pk=spec.pk,
                    group_key=tn.group_key,
                    order_spec=[(tn.order_col, tn.descending)]
                    + [(c, False) for c in tn.tie],
                    out_cols=[c for c in tn.out_cols if c.lower() != tn.rank_alias.lower()],
                    k=tn.k,
                    work_dir=target,
                    num_buckets=num_buckets,
                    shuffle_partitions=shuffle_partitions,
                    rank_col=tn.rank_alias,
                )
                self._stores = {tn.fact: self._mv.fact_store}
                return

        # Partitioned OVER-window view (running sums, per-group ranks,
        # lag/lead) — dirty-partition recompute: a batch's touched
        # groups are re-windowed from the fact store and diffed. Keyed
        # by the fact PK; NULL partitions are first-class.
        ws = match_window_shape(
            query, set(dfs), source_columns, {n: d[0].pk for n, d in dfs.items()}
        )
        if ws is not None:
            spec = dfs[ws.fact][0]
            if pk is None or list(pk) == list(spec.pk):
                from tiflink_spark.mv import IncrementalWindowMV

                self.maintenance_mode = "incremental"
                self._fact_name, self._dim_name = ws.fact, None
                self._join_names = None
                self._change_filter = ws.where
                fact_df = dfs[ws.fact][1]
                if ws.where is not None:
                    from pyspark.sql import functions as F

                    fact_df = fact_df.filter(F.expr(ws.where))
                self.mv_pk = list(spec.pk)
                self.ddl = create_table_ddl(
                    os.path.basename(target), self.mv_schema, self.mv_pk
                )
                items = list(ws.plain_cols) + [
                    f"{expr} AS {alias}" for alias, expr in ws.win_items
                ]
                self._mv = IncrementalWindowMV(
                    spark,
                    fact=fact_df,
                    fact_pk=spec.pk,
                    group_key=list(ws.group_keys),
                    select_items=items,
                    work_dir=target,
                    num_buckets=num_buckets,
                    shuffle_partitions=shuffle_partitions,
                    strategy=getattr(self, "_window_strategy", "sort"),
                )
                self._stores = {ws.fact: self._mv.fact_store}
                return

        # Global ORDER BY + LIMIT (top-k without PARTITION BY) — keyed
        # by the fact PK, which must be selected; the ORDER BY column
        # set must COVER the PK (provably total order, same rule as
        # the per-row window route — ORDER BY the PK itself counts).
        ol = match_order_limit_shape(query, set(dfs), source_columns)
        if ol is not None:
            spec = dfs[ol.fact][0]
            sel_lower = {c.lower() for c in ol.out_cols}
            order_cols = {c.lower() for c, _ in ol.order_spec}
            tie_ok = spec.pk and {p.lower() for p in spec.pk} <= order_cols
            if (
                tie_ok
                and all(p.lower() in sel_lower for p in spec.pk)
                and (pk is None or list(pk) == list(spec.pk))
            ):
                from tiflink_spark.mv import IncrementalGlobalTopKMV

                self.maintenance_mode = "incremental"
                self._fact_name, self._dim_name = ol.fact, None
                self._join_names = None
                self._change_filter = ol.where
                fact_df = dfs[ol.fact][1]
                if ol.where is not None:
                    from pyspark.sql import functions as F

                    fact_df = fact_df.filter(F.expr(ol.where))
                self.mv_pk = list(spec.pk)
                self.ddl = create_table_ddl(
                    os.path.basename(target), self.mv_schema, self.mv_pk
                )
                self._mv = IncrementalGlobalTopKMV(
                    spark,
                    fact=fact_df,
                    fact_pk=spec.pk,
                    order_spec=list(ol.order_spec),
                    out_cols=list(ol.out_cols),
                    k=ol.k,
                    work_dir=target,
                    num_buckets=num_buckets,
                    shuffle_partitions=shuffle_partitions,
                )
                self._stores = {ol.fact: self._mv.fact_store}
                return

        # Stateless projection/filter view — SELECT row-local items
        # FROM t [WHERE row-local] — the simplest maintainable shape
        # (a stateless Calc node in Flink's planner; the reference gets
        # it by delegation, TiFlinkApp.java:270). Matched LAST among
        # the single-table routes: every richer shape (agg, distinct,
        # top-k, window, order-limit) has already claimed its syntax.
        # The changelog maps 1:1 onto the target, keyed by the
        # projected fact PK; a row-local WHERE follows the stateless
        # filter rule via the shared _change_filter path.
        ps = match_projection_shape(
            query, set(dfs), source_columns, {n: d[0].pk for n, d in dfs.items()}
        )
        if ps is not None and (pk is None or list(pk) == list(ps.pk_out)):
            from pyspark.sql import functions as F

            from tiflink_spark.mv import IncrementalProjectionMV

            self.maintenance_mode = "incremental"
            self._fact_name, self._dim_name = ps.fact, None
            self._join_names = None
            self._change_filter = ps.where
            fact_df = dfs[ps.fact][1]
            if ps.where is not None:
                fact_df = fact_df.filter(F.expr(ps.where))
            self.mv_pk = list(ps.pk_out)
            self.ddl = create_table_ddl(
                os.path.basename(target), self.mv_schema, self.mv_pk
            )
            self._mv = IncrementalProjectionMV(
                spark,
                fact=fact_df,
                items=list(ps.items),
                pk_out=list(ps.pk_out),
                work_dir=target,
                num_buckets=num_buckets,
                shuffle_partitions=shuffle_partitions,
            )
            self._stores = {}
            return

        # Two-level nesting: SELECT … FROM ( <inner> ) … — decompose
        # into an inner MV feeding an outer MV through the store's
        # version-diff changelog (CascadeMV). Only taken when BOTH
        # levels route incrementally; a planner bail here is never
        # wrong, only slower (plain recompute below).
        # Top-group reporting shape — GROUP BY … ORDER BY agg LIMIT n —
        # rewrites to the nested form so the cascade machinery maintains
        # it (inner aggregate MV + outer global top-k over its delta).
        nested_query = query
        gol = split_group_order_limit(query)
        if gol is not None:
            body, tail = gol
            try:
                body_cols = [f.name for f in spark.sql(body).schema.fields]
                nested_query = (
                    f"SELECT {', '.join(body_cols)} FROM ( {body} ) __agg {tail}"
                )
            except Exception:
                nested_query = query
        if nested_query == query:
            # Flat M:N join-aggregate (neither side enters through its
            # PK, so the star matcher above bailed): rewrite to the
            # nested spelling the cascade maintains — inner two-sided
            # join MV keyed by both PKs, outer aggregate over its
            # delta. Only the nested PROBE sees the rewrite; the
            # recompute fallback keeps the original text.
            from tiflink_spark.planner import rewrite_mn_join_agg

            mn = rewrite_mn_join_agg(
                query, set(dfs), source_columns,
                {n: d[0].pk for n, d in dfs.items()},
            )
            if mn is not None:
                nested_query = mn
        if nested_query == query:
            # Flat three-table tree with ONE theta edge: rewrite to the
            # nested spelling (inner equi-join MV -> outer theta MV via
            # the cascade's base-table pass-through, round 7).
            from tiflink_spark.planner import rewrite_theta_tree

            tt = rewrite_theta_tree(
                query, set(dfs), source_columns,
                {n: d[0].pk for n, d in dfs.items()},
            )
            if tt is not None:
                nested_query = tt

        ns = split_nested_query(nested_query)
        if ns is not None:
            inner_sql, alias, outer_sql = ns
            inner_dir = os.path.join(target, "inner")
            inner_app = MVApp(
                spark, sources, inner_sql, inner_dir, None,
                num_buckets, shuffle_partitions,
            )
            outer_app = None
            # The outer's stores address rows by the inner's key, so it
            # must be a TRUE unique key. Two ways to have one:
            # - the inner's advertised PK is genuinely unique
            #   (pk_is_unique), or
            # - the inner is a BAG view that exposes its hidden
            #   uniqueness carrier (union-all's branch tag) via
            #   cascade_relation(): the outer consumes the relation
            #   WITH the hidden column, keyed by the target store's
            #   full compound PK, so cross-branch duplicates never
            #   collapse — bag semantics flow through the cascade.
            if inner_app.maintenance_mode == "incremental":
                rel_fn = getattr(inner_app._mv, "cascade_relation", None)
                if inner_app.pk_is_unique:
                    placeholder = spark.sql(inner_sql)
                    inner_key = inner_app.mv_pk
                elif rel_fn is not None:
                    placeholder = rel_fn()
                    ctgt = getattr(inner_app._mv, "cascade_target", None)
                    inner_key = list(
                        ctgt.pk if ctgt is not None else inner_app._mv.target.pk
                    )
                else:
                    placeholder = None
                if placeholder is not None:
                    outer_sources = {alias: (placeholder, inner_key)}
                    # The outer level may reference BASE tables besides
                    # the derived one (round 7: one theta edge over an
                    # otherwise-equi tree — inner equi-join MV, outer
                    # theta join against the third table). Pass those
                    # through; CascadeMV splits each batch's changes
                    # between the levels. Attachment is decided from
                    # the PARSED relation positions (sqlast token
                    # stream), not a regex over raw SQL — a source
                    # name appearing as a column or inside a string
                    # literal must not attach an unused store that
                    # would then be bootstrapped and merged every
                    # batch and silently absorb misdirected
                    # changelogs. Tokenizer bail (None) falls back to
                    # the conservative word-boundary scan.
                    from tiflink_spark.sqlast import relation_names

                    rels = relation_names(outer_sql)
                    if rels is None:
                        import re as _re

                        rels = {
                            n2.lower()
                            for n2 in dfs
                            if _re.search(
                                rf"(?is)\b{_re.escape(n2)}\b", outer_sql
                            )
                        }
                    for n2, (spec2, df2) in dfs.items():
                        if n2 != alias and n2.lower() in rels:
                            outer_sources[n2] = (df2, list(spec2.pk))
                    outer_app = MVApp(
                        spark,
                        outer_sources,
                        outer_sql,
                        os.path.join(target, "outer"),
                        pk,
                        num_buckets,
                        shuffle_partitions,
                    )
            if (
                outer_app is not None
                and outer_app.maintenance_mode == "incremental"
                and not isinstance(outer_app._mv, CascadeMV)
            ):
                self.maintenance_mode = "incremental"
                self._fact_name = self._dim_name = None
                self._join_names = self._change_filter = None
                self._dict_refresh = True
                # The TRUE set the two levels maintain — not
                # set(sources): a nested cascade (multi-theta tree,
                # round 10) reports its own union here, and the parent
                # CascadeMV splits batches by exactly this set. An
                # over-claim would misroute an outer-only base table's
                # changelog into the inner cascade, which raises.
                self._ja_tables = inner_app.maintained_tables() | (
                    outer_app.maintained_tables() - {alias}
                )
                self.mv_pk = list(outer_app.mv_pk)
                self.ddl = create_table_ddl(
                    os.path.basename(target), self.mv_schema, self.mv_pk
                )
                # Share the inner TARGET as the outer's alias mirror:
                # the mirror held an exact copy the inner refresh had
                # already committed (see _SharedMirrorStore). Guarded
                # three ways: the outer route must declare it merges
                # source changelogs verbatim (_mirrors_sources_verbatim
                # — grouping sets enrich with a hidden __g, semijoins
                # pre-filter with WHERE, projections rename: those keep
                # the physical mirror), the shared side must be a plain
                # single store (not a composite grouping-sets façade),
                # and the keys must match.
                from tiflink_spark.store import KeyedParquetStore

                shared_tgt = getattr(inner_app._mv, "cascade_target", None)
                if shared_tgt is None:
                    shared_tgt = getattr(inner_app._mv, "target", None)
                old_mirror = outer_app._stores.get(alias)
                if (
                    getattr(outer_app._mv, "_mirrors_sources_verbatim", False)
                    and isinstance(shared_tgt, KeyedParquetStore)
                    and old_mirror is not None
                    and [c.lower() for c in old_mirror.pk]
                    == [c.lower() for c in shared_tgt.pk]
                ):
                    shared = _SharedMirrorStore(shared_tgt, placeholder.columns)
                    for k2, v2 in list(vars(outer_app._mv).items()):
                        if v2 is old_mirror:
                            setattr(outer_app._mv, k2, shared)
                        elif isinstance(v2, dict):
                            for dk2, dv2 in list(v2.items()):
                                if dv2 is old_mirror:
                                    v2[dk2] = shared
                    outer_app._stores[alias] = shared
                self._mv = CascadeMV(inner_app, outer_app, alias)
                self._stores = dict(inner_app._stores)
                for n2, st2 in outer_app._stores.items():
                    if n2 != alias:
                        self._stores.setdefault(n2, st2)
                return
            # A level fell back: remove the probe's directory skeletons,
            # but ONLY if they hold no data — a rebuild of a previously
            # committed cascade target whose planning now falls back
            # must never destroy committed MV state.
            for d in (inner_dir, os.path.join(target, "outer")):
                if os.path.isdir(d) and not any(
                    files for _, _, files in os.walk(d)
                ):
                    import shutil

                    shutil.rmtree(d, ignore_errors=True)

        self._setup_recompute(spark, dfs, query, target, num_buckets, shuffle_partitions)

    def _plan_temporal(
        self, spark, dfs, query, target, pk, num_buckets, shuffle_partitions
    ):
        """Route a ``FOR SYSTEM_TIME AS OF`` query (event-time temporal
        dim join) to IncrementalTemporalJoinMV, or raise: Spark SQL has
        no temporal-join syntax, so — uniquely among the routes — there
        is no recompute fallback to degrade to."""
        from tiflink_spark.mv import IncrementalTemporalJoinMV
        from tiflink_spark.planner import match_temporal_join_shape

        source_columns = {
            n: [f.name for f in d[1].schema.fields] for n, d in dfs.items()
        }
        source_pks = {n: list(d[0].pk or []) for n, d in dfs.items()}
        shape = match_temporal_join_shape(
            query, set(dfs), source_columns, source_pks
        )
        if shape is None:
            raise ValueError(
                "FOR SYSTEM_TIME AS OF query doesn't fit the temporal-join "
                "envelope (one INNER temporal join, conjunctive-equality ON "
                "covering the dim's PK exactly, AS OF a fact column, plain "
                "column select including the whole fact PK) — and no "
                "recompute fallback exists: Spark SQL cannot execute the "
                "syntax"
            )
        dim_time = self._source_event_time.get(shape.dim)
        if dim_time is None:
            raise ValueError(
                f"temporal dim '{shape.dim}' needs event_time declared on "
                "its source (builder.source(name, df, pk=[...], "
                "event_time='col')) — the column at which each dim version "
                "takes effect (Flink's versioned-table time attribute)"
            )
        fact_pk = source_pks[shape.fact]
        if pk is not None and [c.lower() for c in pk] != [
            c.lower() for c in fact_pk
        ]:
            raise ValueError(
                f"temporal-join MV is keyed by the fact PK {fact_pk}; "
                f"declared target pk {list(pk)} disagrees"
            )
        # schema/DDL from the executable twin: the AS OF restriction
        # only drops rows, never changes the output schema
        plain = re.sub(
            r"(?is)\bFOR\s+SYSTEM_TIME\s+AS\s+OF\s+[A-Za-z_]\w*"
            r"(\s*\.\s*[A-Za-z_]\w*)?",
            " ",
            query,
        )
        self.mv_schema = spark.sql(plain).schema
        self.mv_pk = list(fact_pk)
        self.pk_is_unique = True
        self.ddl = create_table_ddl(
            os.path.basename(target), self.mv_schema, self.mv_pk
        )
        self.maintenance_mode = "incremental"
        self._join_names = None
        self._dict_refresh = True
        self._ja_tables = {shape.fact, shape.dim}
        self._fact_name, self._dim_name = shape.fact, None
        self._change_filter = None
        self._mv = IncrementalTemporalJoinMV(
            spark,
            fact_name=shape.fact,
            fact=dfs[shape.fact][1],
            fact_pk=fact_pk,
            dim_name=shape.dim,
            dim=dfs[shape.dim][1],
            dim_pk=shape.dim_pk,
            dim_time_col=dim_time,
            fk=shape.fk,
            time_col=shape.time_col,
            out_cols=list(shape.out_cols),
            out_src=list(shape.out_src),
            fact_cols=list(shape.fact_cols),
            dim_cols=list(shape.dim_cols),
            work_dir=target,
            num_buckets=num_buckets,
            shuffle_partitions=shuffle_partitions,
            late_dim=getattr(self, "_late_dim", "raise"),
        )

    def _setup_recompute(
        self, spark, dfs, query, target, num_buckets, shuffle_partitions
    ) -> None:
        """The fallback tail: full recompute per batch with a
        change-bounded sink — reached when no incremental matcher
        routed, or directly via the builder's force_recompute() knob."""
        self.maintenance_mode = "recompute"
        self._fact_name = self._dim_name = self._change_filter = self._join_names = None
        # Source-store bootstraps are deferred to bootstrap(): building
        # an MVApp plans, it does not write (the cascade probe above
        # constructs and discards fallback apps).
        self._recompute_inits: list[tuple[KeyedParquetStore, DataFrame]] = []
        for name, (spec_, df) in dfs.items():
            store = KeyedParquetStore(
                spark, os.path.join(target, f"_src_{name}"), spec_.pk, num_buckets
            )
            self._recompute_inits.append((store, df))
            self._stores[name] = store

        # A grouping-body query (ROLLUP/CUBE/GROUPING SETS) that fell
        # through the incremental matcher — multi-table rollup, CUBE(7)+,
        # a non-maintainable HAVING — emits subtotal rows with NULL
        # grouping keys, which the first-output-column PK default
        # (TiFlinkApp.java:276-281) would crash on at store load. Such
        # views diff as BAGS: multiplicity transitions keyed by a hidden
        # null-safe row encoding + copy index (same shape as the setop
        # cascade façade's (tuple, __copy) contract).
        import re as _re

        bag = getattr(self, "_declared_pk", None) is None and bool(
            _re.search(r"(?is)\b(ROLLUP|CUBE|GROUPING\s+SETS)\s*\(", query)
        )
        if bag:
            self.pk_is_unique = False
        self._mv = RecomputeMV(
            spark,
            self._stores,
            spark_executable_query(query),
            os.path.join(target, "mv"),
            pk=self.mv_pk,
            num_buckets=num_buckets,
            shuffle_partitions=shuffle_partitions,
            bag=bag,
        )

    # -- lifecycle -----------------------------------------------------------

    @property
    def maintenance_strategy(self) -> str:
        """The concrete maintenance class the planner routed to."""
        return type(self._mv).__name__

    def describe(self) -> dict:
        """Introspection snapshot: how the view is maintained and where
        it stands — the engine-side answer to the reference's
        coordinator visibility (txn table, GrpcService.java:40-160)."""
        target = getattr(self._mv, "target", None)
        strategy = self.maintenance_strategy
        if isinstance(self._mv, CascadeMV):
            strategy = (
                f"CascadeMV[{self._mv.inner.maintenance_strategy}"
                f" -> {self._mv.outer.maintenance_strategy}]"
            )
        if target is None and isinstance(self._mv, CascadeMV):
            target = getattr(self._mv.outer._mv, "target", None)
        return {
            "query": self.query,
            "maintenance_mode": self.maintenance_mode,
            "maintenance_strategy": strategy,
            # cost_advisor record (None unless the builder enabled it
            # and the planner hit an advised shape)
            "advisor": self.advisor,
            "mv_pk": list(self.mv_pk),
            "mv_columns": [f.name for f in self.mv_schema.fields],
            "ddl": self.ddl,
            "target_version": target.current_version() if target is not None else None,
            "committed_batches": sorted(
                map(str, target.committed_batches())
            ) if target is not None else [],
            "sources": sorted(self._stores),
            "drop_old_table": self.drop_old_table,
            "force_new_table": self.force_new_table,
            # per-batch refresh history off the target's commit manifest
            # (wall-time + touched rows/buckets captured by store.merge)
            "recent_batches": (
                target.recent_commits() if target is not None else []
            ),
        }

    def _all_stores(self) -> list[KeyedParquetStore]:
        """Every KeyedParquetStore the maintenance object owns (source,
        state, joined-relation, and target stores), deduped by id."""
        seen: dict[int, KeyedParquetStore] = {}

        if isinstance(self._mv, CascadeMV):
            stores = self._mv.inner._all_stores() + self._mv.outer._all_stores()
            for s in stores:
                seen.setdefault(id(s), s)
            return list(seen.values())

        def add(obj):
            if isinstance(obj, KeyedParquetStore):
                seen.setdefault(id(obj), obj)

        nested = [self._mv, getattr(self._mv, "_agg", None)]
        nested += list(getattr(self._mv, "_sides", {}).values())
        # grouping-sets decomposition: one sub-MV per set (shared fact
        # store dedupes by id; each sub's state/target is its own)
        nested += list(getattr(self._mv, "subs", []))
        for mv in nested:
            if mv is None:
                continue
            for attr in ("fact_store", "state_store", "dim_store",
                         "hist_store", "left_store", "right_store", "target"):
                try:
                    add(getattr(mv, attr, None))
                except AssertionError:
                    pass  # multi-dim dim_store accessor asserts single-dim
            for s in getattr(mv, "dim_stores", {}).values():
                add(s)
        for s in self._stores.values():
            add(s)
        return list(seen.values())

    def compact(self) -> "MVApp":
        """Rewrite every store's current state into a single fresh
        version (bounds manifest/bucket fragmentation on long-lived
        views); reads see the same data before and after."""
        for store in self._all_stores():
            store.compact()
        return self

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Drop unreferenced version directories older than the last
        ``keep_last`` (the time-travel window shrinks accordingly)."""
        removed: list[str] = []
        for store in self._all_stores():
            removed += store.vacuum(keep_last)
        return removed

    def _target_committed(self) -> bool:
        """True when ANY store under the target working dir holds a
        commit manifest — the 'table already exists' probe for the
        force_new_table / drop_old_table lifecycle flags."""
        from tiflink_spark.store import COMMITS_FILE

        if not os.path.isdir(self.target_path):
            return False
        for root, _dirs, files in os.walk(self.target_path):
            if COMMITS_FILE in files:
                return True
        return False

    def bootstrap(self, batch_id=0) -> "MVApp":
        # Target lifecycle (ensureTargetTable, TiFlinkApp.java:104-115):
        # drop_old_table wipes the previous run's entire target state so
        # this bootstrap republishes from the CURRENT sources;
        # force_new_table then refuses a still-existing target (CREATE
        # TABLE without IF NOT EXISTS). Default: attach idempotently.
        if self.drop_old_table and os.path.isdir(self.target_path):
            import shutil

            shutil.rmtree(self.target_path, ignore_errors=True)
        if self.force_new_table and self._target_committed():
            raise ValueError(
                f"target '{self.target_path}' already holds a committed MV "
                "and force_new_table is set — drop_old_table(True) to "
                "replace it, or leave force_new_table off to attach"
            )
        # Opt-in source-PK audit: a falsely-declared PK (duplicate or
        # NULL keys) corrupts MERGE-by-PK maintenance silently; fail
        # loudly here instead. One aggregate pass per source.
        if self._validate_pks:
            from pyspark.sql import functions as F

            for name, (pk_cols, df) in self._source_frames.items():
                if not pk_cols:
                    continue
                null_any = None
                for c in pk_cols:
                    cond = F.col(c).isNull()
                    null_any = cond if null_any is None else (null_any | cond)
                r = df.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.count_distinct(*[F.col(c) for c in pk_cols]).alias("d"),
                    F.sum(F.when(null_any, 1).otherwise(0)).alias("nulls"),
                ).head()
                if r["nulls"]:
                    raise ValueError(
                        f"source '{name}': {r['nulls']} rows have NULL in "
                        f"declared PK {list(pk_cols)} (PRIMARY KEY implies "
                        f"NOT NULL)"
                    )
                if r["n"] != r["d"]:
                    raise ValueError(
                        f"source '{name}' is not unique on declared PK "
                        f"{list(pk_cols)}: {r['n']} rows vs {r['d']} "
                        f"distinct keys — maintenance would silently "
                        f"collapse duplicates"
                    )

        # Target DDL executes before the first publish — the reference's
        # lifecycle step 3 (TiJDBCHelper.java:111-140).
        if self._ddl_hook is not None:
            self._ddl_hook(self.ddl)
        for store, df in getattr(self, "_recompute_inits", []):
            if not store.committed_batches():
                store.bootstrap(df, batch_id="src-init")
        self._mv.bootstrap(batch_id)
        return self

    def maintained_tables(self) -> set[str]:
        """Source tables whose changelogs this app's route consumes —
        what :meth:`refresh` accepts without raising. CascadeMV uses
        this to split a batch's changes between its two levels."""
        if self.maintenance_mode == "incremental":
            if self._join_names is not None:
                return set(self._join_names)
            if self._dict_refresh:
                return set(self._ja_tables)
            known = {self._fact_name}
            if self._dim_name:
                known.add(self._dim_name)
            return known
        return set(self._stores)

    def refresh(self, changes: dict[str, DataFrame], batch_id) -> bool:
        """Apply one changelog micro-batch (table name → __op/__seq rows)."""
        if self.maintenance_mode == "incremental" and self._join_names is not None:
            l, r = self._join_names
            unknown = set(changes) - {l, r}
            if unknown:
                raise ValueError(
                    f"incremental join MV maintains only {[l, r]}; "
                    f"got changes for {sorted(unknown)}"
                )
            ld, rd = changes.get(l), changes.get(r)
            if ld is None and rd is None:
                return False
            return self._mv.refresh(ld, rd, batch_id)
        if self.maintenance_mode == "incremental" and self._dict_refresh:
            unknown = set(changes) - self._ja_tables
            if unknown:
                raise ValueError(
                    f"incremental MV maintains only {sorted(self._ja_tables)}; "
                    f"got changes for {sorted(unknown)}"
                )
            return self._mv.refresh(changes, batch_id)
        if self.maintenance_mode == "incremental":
            known = {self._fact_name} | ({self._dim_name} if self._dim_name else set())
            unknown = set(changes) - known
            if unknown:
                raise ValueError(
                    f"incremental MV maintains only {sorted(known)}; "
                    f"got changes for {sorted(unknown)}"
                )
            fact_delta = changes.get(self._fact_name)
            dim_delta = changes.get(self._dim_name) if self._dim_name else None
            if fact_delta is None and dim_delta is None:
                return False
            if fact_delta is not None and self._derive:
                from pyspark.sql import functions as F

                for alias, expr in self._derive:
                    fact_delta = fact_delta.withColumn(alias, F.expr(expr))
            if fact_delta is not None and self._change_filter is not None:
                from tiflink_spark.changelog import apply_filter

                fact_delta = apply_filter(fact_delta, self._change_filter)
            if dim_delta is None:
                # fact-only MVs (agg without dim, distinct, top-k) share
                # the (changes, batch_id) refresh signature
                return self._mv.refresh(fact_delta, batch_id)
            return self._mv.refresh(fact_delta, batch_id, dim_changes=dim_delta)
        return self._mv.refresh(changes, batch_id)

    def start_streaming(
        self,
        changelog_dirs: dict[str, str],
        checkpoint_dir: str,
        available_now: bool = True,
        trigger_interval: str | None = None,
    ):
        """CDC phase: consume changelog directories as file streams and
        MERGE each micro-batch (FlinkTikvConsumer.java:92-106 handoff;
        foreachBatch is the exactly-once txn boundary).

        ``trigger_interval`` (e.g. ``"1 second"``) switches from the
        drain-and-stop ``availableNow`` mode to a LIVE continuously
        refreshing view — ``trigger(processingTime=...)``. This is the
        reference's only mode: its refresh rate IS the checkpoint
        interval (``setCheckpointInterval``, TiFlinkExample.java:22-23;
        README.md "This interval determines data refresh rate"). Live
        streams return immediately; call :meth:`stop_streaming` (or
        ``awaitTermination`` on the returned handles via
        ``self._streams``) to end them.

        Commit serialization: the keyed stores are single-writer, so
        drain mode runs streams ONE AT A TIME, and live mode wraps
        every foreachBatch in one shared lock — the engine-side analog
        of the reference's commit-ordering coordinator
        (maxConcurrentCheckpoints=1, TiFlinkApp.java:245; commit-in-
        checkpoint-order, GrpcService.java:87-135)."""
        import threading

        live = trigger_interval is not None
        commit_lock = threading.Lock()
        self._streams = []
        for name, d in changelog_dirs.items():
            schema = self.spark.read.parquet(d).schema

            def make_batch_fn(table):
                def fn(df, epoch_id):
                    with commit_lock:
                        self.refresh({table: df}, batch_id=f"{table}-{epoch_id}")

                return fn

            writer = (
                self.spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(d)
                .writeStream.foreachBatch(make_batch_fn(name))
                .option("checkpointLocation", os.path.join(checkpoint_dir, name))
            )
            if live:
                q = writer.trigger(processingTime=trigger_interval).start()
                self._streams.append(q)
            else:
                q = writer.trigger(availableNow=available_now).start()
                q.awaitTermination()
        return self

    def stop_streaming(self) -> "MVApp":
        """Stop any live (processingTime-triggered) streams started by
        :meth:`start_streaming`."""
        for q in getattr(self, "_streams", []):
            q.stop()
        self._streams = []
        return self

    def read(self, version: int | None = None) -> DataFrame:
        """Consistent MV state, in the query's SELECT column order.

        The incremental maintenance routes store MV rows PK-first
        internally; the user-facing contract (mv_schema, the generated
        DDL, positional consumers) is the resolved query's column
        order, so the read projects through it."""
        out = self._mv.read(version)
        # With a column_names override the stores/maintenance carry the
        # query's own names; order by those, then rename for the user.
        ordered = (
            self._orig_out_names
            if self._column_names is not None
            else [f.name for f in self.mv_schema.fields]
        )
        # Subset-select also drops engine-internal columns (e.g. the
        # hidden DISTINCT count) that never belong to the query schema.
        if set(ordered) <= set(out.columns) and ordered != list(out.columns):
            out = out.select(*ordered)
        if self._column_names is not None:
            out = out.toDF(*self._column_names)
        # Stores home their frames on the maintenance session; hand the
        # user a frame on THEIR session so their conf governs execution
        # (and a concurrently-running refresh's tuning never does).
        from tiflink_spark.session import rehome

        return rehome(out, self.spark)
