"""MVApp end-to-end: builder -> bootstrap -> streaming changelog -> read."""

from pyspark.sql import functions as F

from tiflink_spark.app import MVApp
from tiflink_spark.changelog import OP_COL, OP_DELETE, OP_INSERT, SEQ_COL

SF_DIR = "/root/testdata/sf0.001"


def test_mvapp_full_lifecycle(spark, tmp_path):
    app = (
        MVApp.builder(spark)
        .source("orders_a", f"{SF_DIR}/orders.parquet", pk=["o_orderkey"])
        .source("customer_a", f"{SF_DIR}/customer.parquet", pk=["c_custkey"])
        .query(
            """SELECT c_custkey, c_name,
                      (SELECT count(*) FROM orders_a o
                       WHERE o.o_custkey = c.c_custkey) AS order_cnt
               FROM customer_a c"""
        )
        .target(str(tmp_path / "mv_counts"))
        .num_buckets(4)
        .build()
    )
    # PK inference: defaults to first output column (TiFlinkApp.java:276-281)
    assert app.mv_pk == ["c_custkey"]
    assert "PRIMARY KEY (`c_custkey`)" in app.ddl

    app.bootstrap()
    v0 = {(r.c_custkey, r.order_cnt) for r in app.read().collect()}
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")

    # changelog: delete every order of the customer with the most orders
    top = (
        orders.groupBy("o_custkey").count().orderBy(F.desc("count"), "o_custkey").first()
    )
    changes = (
        orders.filter(F.col("o_custkey") == top["o_custkey"])
        .withColumn(OP_COL, F.lit(OP_DELETE))
        .withColumn(SEQ_COL, F.monotonically_increasing_id())
    )
    chlog = tmp_path / "chlog"
    changes.coalesce(1).write.parquet(str(chlog))

    app.start_streaming({"orders_a": str(chlog)}, checkpoint_dir=str(tmp_path / "ckpt"))

    after = {(r.c_custkey, r.order_cnt) for r in app.read().collect()}
    assert (top["o_custkey"], top["count"]) in v0
    assert (top["o_custkey"], 0) in after
    assert len(after) == len(v0)

    # stale snapshot: version 0 still shows the pre-delete count
    stale = {(r.c_custkey, r.order_cnt) for r in app.read(version=0).collect()}
    assert stale == v0
