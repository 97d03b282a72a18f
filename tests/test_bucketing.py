"""Scale toolkit: bucketed joins plan with no Exchange; salted joins
produce plain-join results."""

from pyspark.sql import functions as F

from tiflink_spark.bucketing import bucketed_join, salted_join, write_bucketed_table


import pytest

def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.slow
def test_bucketed_join_has_no_exchange(spark):
    a = spark.createDataFrame([(i, f"a{i}") for i in range(1000)], "k int, va string")
    b = spark.createDataFrame([(i, f"b{i}") for i in range(0, 1000, 2)], "k int, vb string")
    write_bucketed_table(a, "bkt_a", ["k"], num_buckets=8, sort_cols=["k"])
    write_bucketed_table(b, "bkt_b", ["k"], num_buckets=8, sort_cols=["k"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (tiny test tables would broadcast) to
        # show the bucketed layout joins with no shuffle exchange at all
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "bkt_a", "bkt_b", ["k"])
        assert joined.count() == 500
        plan = _physical_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_salted_join_matches_plain_join(spark):
    # heavily skewed key 0
    big = spark.createDataFrame(
        [(0, i) for i in range(5000)] + [(k, k) for k in range(1, 50)], "k int, v int"
    )
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(50)], "k int, name string")
    plain = big.join(small, "k").select("k", "v", "name")
    salted = salted_join(big, small, "k").select("k", "v", "name")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
