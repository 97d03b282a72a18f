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
