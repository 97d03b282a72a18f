"""Store compaction + vacuum: state survives, old version dirs go away."""

import os

from tiflink_spark.changelog import OP_COL, OP_INSERT, OP_UPDATE, SEQ_COL
from tiflink_spark.store import KeyedParquetStore


def _changes(spark, rows):
    return spark.createDataFrame(rows, f"k int, v string, {OP_COL} string, {SEQ_COL} long")


def test_compact_and_vacuum(spark, tmp_path):
    store = KeyedParquetStore(spark, str(tmp_path / "s"), ["k"], num_buckets=4)
    store.bootstrap(spark.createDataFrame([(i, "x") for i in range(20)], "k int, v string"))
    for i in range(1, 4):
        store.merge(_changes(spark, [(i, f"v{i}", OP_UPDATE, 0), (100 + i, "n", OP_INSERT, 1)]), batch_id=i)
    before = {(r.k, r.v) for r in store.read().collect()}

    v = store.compact()
    assert store.current_version() == v
    assert {(r.k, r.v) for r in store.read().collect()} == before

    removed = store.vacuum(keep_last=1)
    assert removed, "expected old version dirs to be deleted"
    data_dirs = os.listdir(tmp_path / "s" / "data")
    assert data_dirs == [f"v{v}"]
    # state still fully readable after vacuum
    assert {(r.k, r.v) for r in store.read().collect()} == before
    # idempotence memory survives vacuum (manifest not pruned)
    assert store.merge(_changes(spark, [(1, "zz", OP_UPDATE, 0)]), batch_id=3) is False


def test_grouping_sets_stores_reachable_by_maintenance(spark, tmp_path):
    """compact()/vacuum() must reach every per-set sub-MV store of the
    grouping-sets decomposition (1 shared fact + per-set state+target)."""
    from tiflink_spark.app import MVApp

    src = spark.createDataFrame(
        [(i, i % 2, i % 3, float(i)) for i in range(20)],
        "id long, g long, sub long, v double",
    )
    app = (
        MVApp.builder(spark)
        .source("gs_sa", src, pk=["id"])
        .query("SELECT g, sub, count(*) AS n FROM gs_sa GROUP BY ROLLUP(g, sub)")
        .target(str(tmp_path / "gs_sa"))
        .num_buckets(2)
        .shuffle_partitions(2)
        .build()
    )
    app.bootstrap()
    stores = app._all_stores()
    assert len(stores) == 7  # shared fact + 3 sets x (state, target)
    app.compact()
    assert len(app.vacuum()) == 7
    # still readable after maintenance
    assert app.read().count() > 0


def test_vacuum_compacts_manifest_preserving_idempotence(spark, tmp_path):
    """vacuum() truncates _mv_commits to the tail window; the dropped
    prefix is summarized by a high-water-mark line so every truncated
    batch id still reads as committed (replay stays a no-op)."""
    store = KeyedParquetStore(spark, str(tmp_path / "s"), ["k"], num_buckets=4)
    store.bootstrap(spark.createDataFrame([(i, "x") for i in range(10)], "k int, v string"))
    for i in range(1, 6):
        store.merge(_changes(spark, [(i, f"v{i}", OP_UPDATE, 0)]), batch_id=i)
    before = {(r.k, r.v) for r in store.read().collect()}

    store.vacuum(keep_last=2)
    # manifest is now bounded: 1 hwm line + 2 kept commit lines
    with open(store._commits_path) as f:
        lines = [l for l in f if l.strip()]
    assert len(lines) == 3
    # every truncated batch id still refuses replay
    for i in range(0, 6):
        assert store.merge(_changes(spark, [(i, "zz", OP_UPDATE, 0)]), batch_id=i) is False
    # state unchanged, num_buckets survives a fresh open
    assert {(r.k, r.v) for r in store.read().collect()} == before
    reopened = KeyedParquetStore(spark, str(tmp_path / "s"), ["k"])
    assert reopened.num_buckets == 4
    assert 3 in reopened.committed_batches()


def test_manifest_bounded_at_10k_batches(spark, tmp_path):
    """A store whose manifest saw 10k batch commits opens with a bounded
    manifest after vacuum and still refuses every replayed batch id.
    The 10k prefix is synthesized at the file level (one line per batch,
    exactly what merge() appends) — the machinery under test is the
    manifest, not the Spark write path."""
    import json as _json

    store = KeyedParquetStore(spark, str(tmp_path / "s"), ["k"], num_buckets=4)
    store.bootstrap(spark.createDataFrame([(1, "x")], "k int, v string"), batch_id=0)
    base = store.current_version()
    last = store._commits()[-1]
    with open(store._commits_path, "a") as f:
        for i in range(1, 10_001):
            rec = dict(last, batch_id=i, version=base + i)
            f.write(_json.dumps(rec) + "\n")
    store.vacuum(keep_last=2)
    with open(store._commits_path) as f:
        assert len([l for l in f if l.strip()]) == 3
    committed = store.committed_batches()
    assert all(i in committed for i in range(0, 10_001))
    assert 10_001 not in committed
    # a batch below the compaction window cannot be replay-diffed: loud
    import pytest as _pytest

    with _pytest.raises(KeyError):
        store.version_before_batch(5)


def test_repeated_vacuum_merges_hwm_lines(spark, tmp_path):
    """Successive vacuums fold prior hwm lines (and non-integer ids like
    compaction markers) into one summary; idempotence survives all of it."""
    store = KeyedParquetStore(spark, str(tmp_path / "s"), ["k"], num_buckets=4)
    store.bootstrap(spark.createDataFrame([(i, "x") for i in range(10)], "k int, v string"))
    for i in range(1, 4):
        store.merge(_changes(spark, [(i, f"v{i}", OP_UPDATE, 0)]), batch_id=i)
    store.vacuum(keep_last=1)
    cv = store.compact()
    for i in range(4, 7):
        store.merge(_changes(spark, [(i, f"v{i}", OP_UPDATE, 0)]), batch_id=i)
    store.vacuum(keep_last=1)
    committed = store.committed_batches()
    for i in range(0, 7):
        assert i in committed
    assert f"__compact__-{cv}" in committed  # non-int id carried explicitly
    assert store.read().count() == 10
