"""approx_count_distinct exactness bound (the pytest the round-1
docstring promised): HLL++ at rsd=0.01 must land within 5% of the
exact distinct count on the real test tables."""

from pyspark.sql import functions as F

from tiflink_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"


def test_approx_count_distinct_within_bound(spark):
    li = load_tables(spark, SF_DIR)["lineitem"]
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.01).alias("approx"),
            F.countDistinct("l_partkey").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) <= max(0.05 * r.exact, 2), (
            f"flag {r.l_returnflag}: approx {r.approx} vs exact {r.exact}"
        )
