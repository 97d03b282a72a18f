"""Keyed versioned store: publish, MERGE, idempotence, time travel."""

import pytest

from tiflink_spark.changelog import OP_COL, OP_DELETE, OP_INSERT, OP_UPDATE, SEQ_COL
from tiflink_spark.store import KeyedParquetStore


@pytest.fixture()
def store(spark, tmp_path):
    return KeyedParquetStore(spark, str(tmp_path / "s"), ["k"], num_buckets=4)


def _changes(spark, rows):
    return spark.createDataFrame(rows, f"k int, v string, {OP_COL} string, {SEQ_COL} long")


def test_bootstrap_and_read(spark, store):
    store.bootstrap(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    assert {(r.k, r.v) for r in store.read().collect()} == {(1, "a"), (2, "b")}
    assert store.current_version() == 0


def test_merge_and_time_travel(spark, store):
    store.bootstrap(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    store.merge(_changes(spark, [(1, "A", OP_UPDATE, 0), (3, "c", OP_INSERT, 1)]), batch_id=1)
    store.merge(_changes(spark, [(2, None, OP_DELETE, 0)]), batch_id=2)
    assert {(r.k, r.v) for r in store.read().collect()} == {(1, "A"), (3, "c"), (2, "b")} - {(2, "b")}
    # stale snapshot reads (the reference's Stale Snapshot Isolation analog)
    assert {(r.k, r.v) for r in store.read(version=0).collect()} == {(1, "a"), (2, "b")}
    assert {(r.k, r.v) for r in store.read(version=1).collect()} == {(1, "A"), (2, "b"), (3, "c")}


def test_merge_idempotent_by_batch_id(spark, store):
    store.bootstrap(spark.createDataFrame([(1, "a")], "k int, v string"))
    c = _changes(spark, [(2, "b", OP_INSERT, 0)])
    assert store.merge(c, batch_id=1) is True
    assert store.merge(c, batch_id=1) is False  # replay: no-op
    assert store.read().count() == 2


def test_delete_everything_leaves_empty_state(spark, store):
    store.bootstrap(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    store.merge(
        _changes(spark, [(1, None, OP_DELETE, 0), (2, None, OP_DELETE, 1)]), batch_id=1
    )
    out = store.read()
    assert out.count() == 0
    assert set(out.columns) == {"k", "v"}  # schema survives emptiness


def test_version_before_batch(spark, store):
    store.bootstrap(spark.createDataFrame([(1, "a")], "k int, v string"), batch_id=0)
    store.merge(_changes(spark, [(2, "b", OP_INSERT, 0)]), batch_id=7)
    assert store.version_before_batch(7) == 0
    assert store.version_before_batch(99) == store.current_version()


def test_bucket_pruned_merge_rewrites_only_touched_buckets(spark, store):
    """The 100 TB property: a small MERGE must not rewrite every bucket."""
    store.bootstrap(spark.createDataFrame([(i, "x") for i in range(100)], "k int, v string"))
    before = dict(store._commits()[-1]["buckets"])
    store.merge(_changes(spark, [(1, "Y", OP_UPDATE, 0)]), batch_id=1)
    after = dict(store._commits()[-1]["buckets"])
    unchanged = sum(1 for b, rel in after.items() if before.get(b) == rel)
    assert unchanged >= len(after) - 1  # at most one bucket rewritten


def test_changes_between_versions_roundtrip(spark, tmp_path):
    """store.changes_between(v1, v2) replayed onto the v1 state must
    reproduce v2 exactly — the MV-cascade edge contract."""
    from tiflink_spark.changelog import OP_COL, SEQ_COL, merge_changes
    from tiflink_spark.store import KeyedParquetStore, changes_between

    st = KeyedParquetStore(spark, str(tmp_path / "s"), ["k"], num_buckets=2)
    st.bootstrap(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string"))
    v1 = st.current_version()
    st.merge(
        spark.createDataFrame(
            [(2, "B", "+U", 0), (3, None, "-D", 1), (4, "d", "+I", 2)],
            f"k int, v string, {OP_COL} string, {SEQ_COL} long",
        ),
        batch_id=1,
    )
    v2 = st.current_version()

    diff = changes_between(st, v1, v2)
    replayed = merge_changes(st.read(v1), diff, ["k"])
    assert {(r.k, r.v) for r in replayed.collect()} == {
        (r.k, r.v) for r in st.read(v2).collect()
    }
    # bootstrap-diff form: from_version=None yields an all-insert changelog
    full = changes_between(st, None, v2)
    assert {r[0] for r in full.select(OP_COL).distinct().collect()} == {"+I"}
