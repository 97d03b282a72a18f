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
