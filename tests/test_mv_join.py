"""IncrementalJoinMV: two-sided random changelogs converge to the
batch join after every micro-batch."""

import random

from pyspark.sql import functions as F

from tiflink_spark.changelog import OP_COL, OP_DELETE, OP_INSERT, OP_UPDATE, SEQ_COL
from tiflink_spark.mv import IncrementalJoinMV

N_L, N_R, N_K = 40, 12, 8


def _rand_changes(rng, side):
    rows = []
    for seq in range(15):
        if side == "l":
            pk = rng.randrange(N_L)
            op = rng.choice([OP_INSERT, OP_UPDATE, OP_DELETE])
            if op == OP_DELETE:
                rows.append((pk, None, None, OP_DELETE, seq))
            else:
                rows.append((pk, rng.randrange(N_K), float(rng.randrange(100)), op, seq))
        else:
            pk = rng.randrange(N_R)
            op = rng.choice([OP_UPDATE, OP_UPDATE, OP_DELETE])
            if op == OP_DELETE:
                rows.append((pk, None, OP_DELETE, seq))
            else:
                rows.append((pk, f"name{rng.randrange(50)}", op, seq))
    return rows


def test_join_mv_converges_on_two_sided_changelogs(spark, tmp_path):
    rng = random.Random(4242)
    left0 = spark.createDataFrame(
        [(i, i % N_K, float(i)) for i in range(0, N_L, 2)], "lid int, k int, v double"
    )
    right0 = spark.createDataFrame(
        [(i, f"name{i}") for i in range(0, N_R, 2)], "k int, name string"
    )
    # right is keyed BY the join key here (dim-like); pk == join key.
    mv = IncrementalJoinMV(
        spark,
        left=left0,
        left_pk=["lid"],
        right=right0,
        right_pk=["k"],
        join_key="k",
        out_cols=["lid", "k", "v", "name"],
        work_dir=str(tmp_path / "jmv"),
        num_buckets=4,
    )
    mv.bootstrap()

    for i in range(1, 4):
        lc = spark.createDataFrame(
            _rand_changes(rng, "l"), f"lid int, k int, v double, {OP_COL} string, {SEQ_COL} long"
        )
        rc = spark.createDataFrame(
            _rand_changes(rng, "r"), f"k int, name string, {OP_COL} string, {SEQ_COL} long"
        )
        mv.refresh(lc, rc, batch_id=i)
        expected = {
            (r.lid, r.k, r.v, r.name)
            for r in mv.left_store.read()
            .join(mv.right_store.read(), "k")
            .select("lid", "k", "v", "name")
            .collect()
        }
        got = {(r.lid, r.k, r.v, r.name) for r in mv.read().collect()}
        assert got == expected, f"join MV diverged after batch {i}"

    # replay idempotence
    snapshot = {tuple(r) for r in mv.read().collect()}
    assert mv.refresh(lc, rc, batch_id=3) is False
    assert {tuple(r) for r in mv.read().collect()} == snapshot
