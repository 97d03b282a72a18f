"""TPC-H-shape battery: the remaining Q4-Q22 query shapes, adapted to the
driver's trimmed schema (no partsupp table, no commit/receipt dates, no
comment/phone columns — see TESTDATA.md).

The reference delegates its whole query surface to Flink StreamSQL
(TiFlinkApp.java:270); these shapes prove the equivalent Spark SQL /
DataFrame surface end-to-end: semi/anti joins from EXISTS, correlated and
uncorrelated scalar subqueries, HAVING-subqueries, conditional aggregates,
disjunctive pushdown predicates, and deterministic top-k.

Scale notes (100 TB): every dim join here (nation/region/part/supplier)
is broadcast-eligible under the session's 64 MB threshold; the fact-fact
joins shuffle on their natural keys (l_orderkey / o_orderkey), which is
the co-partitioning you'd bucket on at cluster scale. The correlated
EXISTS / NOT EXISTS pairs decorrelate to semi/anti hash joins keyed the
same way — verified via .explain (no nested-loop anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflink_spark.queries import register
from tiflink_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str):
    return load_tables(spark, sf_dir)


def _rev():
    # Column expressions need an active SparkContext; build lazily.
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS decorrelated to a left-semi join, then agg. "
    "Adaptation: commitdate<receiptdate -> shipdate>orderdate (schema has no "
    "commit/receipt dates).",
    tags=("tpch", "semi-join", "agg"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    li = t["lineitem"]
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: single-scan filter+agg; every predicate pushdown-eligible.",
    tags=("tpch", "scan", "agg"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@register(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 year(CAST(l_shipdate AS DATE)) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier, lineitem, orders, customer, nation n1, nation n2
          WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
            AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
            AND c_nationkey = n2.n_nationkey
            AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bidirectional two-nation trade volume by year. Both "
    "nation joins broadcast; fact-fact join shuffles on orderkey.",
    tags=("tpch", "join", "agg"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    # The pair predicate implies supp_nation IN (N1,N2) AND cust_nation
    # IN (N1,N2) — a disjunctive implication Catalyst does not derive on
    # its own, so the original shape broadcast ALL 150k orders and
    # probed them with ALL of lineitem before the nation filter dropped
    # ~99% of rows at the top of the plan. Pre-filtering the two nation
    # dims (guide §3.2 "reduce the big side before joining") shrinks
    # supplier/customer to ~8% each and orders to ~8%, so every build
    # side is ~12x smaller and most lineitem rows are dropped at their
    # FIRST join. The residual pair filter is unchanged, join strategy
    # stays planner-chosen (broadcast locally; SMJ at scale).
    both = ["NATION_1", "NATION_2"]
    n1 = t["nation"].filter(F.col("n_name").isin(both)).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].filter(F.col("n_name").isin(both)).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sup_f = t["supplier"].join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key")
    ).select("s_suppkey", "supp_nation")
    cust_f = t["customer"].join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey", "cust_nation")
    ord_f = t["orders"].join(
        cust_f, F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "cust_nation")
    joined = (
        t["lineitem"]
        .join(ord_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(sup_f, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("date")).alias("l_year"),
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@register(
    "q8_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (SELECT year(CAST(o_orderdate AS DATE)) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS nation
          FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
            AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
            AND p_type = 'STANDARD') all_nations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: conditional-aggregate market share of one supplier "
    "nation within a customer region, per order year.",
    tags=("tpch", "join", "agg", "conditional"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    n1 = t["nation"].select("n_nationkey", "n_regionkey")
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    base = (
        t["lineitem"]
        .join(F.broadcast(t["part"].filter(F.col("p_type") == "STANDARD")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
            _rev().alias("volume"),
            "nation",
        )
    )
    return base.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            4,
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    """
    SELECT nation, o_year,
           CAST(sum(amount_e4) AS DOUBLE) / 10000.0 AS sum_profit
    FROM (SELECT n_name AS nation, year(CAST(o_orderdate AS DATE)) AS o_year,
                 CAST(floor((l_extendedprice * (1 - l_discount)
                      - 0.5 * p_retailprice * l_quantity) * 10000.0 + 0.5)
                      AS BIGINT) AS amount_e4
          FROM part, supplier, lineitem, orders, nation
          WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
            AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
            AND p_name LIKE '%widget%') profit
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape: product-line profit by supplier nation and year. "
    "Adaptation: no partsupp, so cost = 0.5 * p_retailprice * qty. "
    "Cross-engine determinism: the per-row amount is snapped to integer "
    "ten-thousandths via floor(x*10000+0.5) — floor of an identical IEEE "
    "double is engine-invariant, unlike double→DECIMAL casts (Spark rounds "
    "HALF_UP, DuckDB half-to-even, and it varies by DuckDB version). The "
    "BIGINT sum is exact and order-independent; one double division at the "
    "end is the same IEEE op on both engines.",
    tags=("tpch", "join", "agg"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("%widget%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
        )
        .agg(
            (
                F.sum(
                    F.floor(
                        (
                            _rev()
                            - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
                        )
                        * 10000.0
                        + 0.5
                    )
                ).cast("double")
                / 10000.0
            ).alias("sum_profit")
        )
    )


@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND CAST(o_orderdate AS DATE) >= DATE '1996-10-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10: top-20 customers by lost revenue from returns; ordering "
    "on the rounded aggregate + custkey tiebreak for cross-engine stability.",
    tags=("tpch", "join", "agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-10-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-01-01").cast("date"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q11_important_stock",
    """
    SELECT n_name, round(sum(s_acctbal), 2) AS value
    FROM supplier, nation
    WHERE s_nationkey = n_nationkey
    GROUP BY n_name
    HAVING sum(s_acctbal) > (SELECT sum(s_acctbal) * 0.05 FROM supplier)
    """,
    doc="TPC-H Q11 shape: group-agg filtered by an uncorrelated scalar "
    "subquery over the same table (HAVING > global fraction). Adaptation: "
    "no partsupp, so supplier account balances stand in for stock value.",
    tags=("tpch", "subquery", "agg"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name, round(sum(s_acctbal), 2) AS value
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        HAVING sum(s_acctbal) > (SELECT sum(s_acctbal) * 0.05 FROM supplier)
        """
    )


@register(
    "q12_priority_lines",
    """
    SELECT l_linestatus,
           count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey AND l_shipdate > o_orderdate
      AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape: conditional counts of high/low-priority orders per "
    "line status. Adaptation: l_shipmode -> l_linestatus, late = shipped "
    "after order date.",
    tags=("tpch", "join", "conditional"),
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13: orders-per-customer histogram via left join + double agg "
    "(customers with zero orders count in the 0 bucket).",
    tags=("tpch", "join", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND CAST(l_shipdate AS DATE) >= DATE '1996-09-01'
      AND CAST(l_shipdate AS DATE) < DATE '1996-10-01'
    """,
    doc="TPC-H Q14: promo revenue percentage for one month; part side "
    "broadcast, fact side filter-pushed.",
    tags=("tpch", "join", "conditional"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-09-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-10-01").cast("date"))
    )
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(0.0)
    return (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(_rev()), 4).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15: supplier(s) hitting the max quarterly revenue — the "
    "scalar MAX evaluates as a parallel agg(max) over the ONE revenue "
    "aggregate, cross-attached by broadcast (the CTE-subquery spelling "
    "re-scanned lineitem for the max side; a max() OVER () window "
    "gathered every per-supplier row into ONE task); rounded before MAX "
    "so the winner is cross-engine deterministic.",
    tags=("tpch", "subquery", "agg"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The scalar max subquery re-planned the whole revenue CTE (second
    # full lineitem scan + aggregate; exchange reuse does not fire
    # across a scalar-subquery boundary). agg(max) over the revenue
    # frame is a partial+final aggregate — no single-partition window
    # gather (at TPC-H 100 TB the per-supplier frame is ~1e9 rows) —
    # and ReuseExchange dedupes the shared revenue subtree, so lineitem
    # is still scanned once (guide §2.4/§2.5; pinned in test_plans).
    # The rounded revenues are computed once per side of one exchange,
    # so the equality filter compares values from a single evaluation.
    t = _t(spark, sf_dir)
    # The explicit IS NOT NULL matches the constraint the supplier equi
    # join infers and pushes into ITS copy of the scan — without it the
    # two revenue subtrees differ by that one pushed filter and
    # ReuseExchange cannot dedupe them. A NULL-suppkey group could never
    # reach the output (the equi join drops it); it could only shift the
    # max — and the driver's lineitem generator never emits NULL
    # l_suppkey (verified across all SFs), so results are unchanged.
    li = t["lineitem"].filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01").cast("date"))
        & F.col("l_suppkey").isNotNull()
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    top = rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx")).drop(
        "__mx"
    )
    return (
        t["supplier"]
        .join(top, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_cnt",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: distinct-supplier counts per part attribute combo. "
    "Adaptation: supplier-part pairs come from lineitem (no partsupp).",
    tags=("tpch", "agg", "distinct"),
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#3' AND p_type = 'SMALL'
      AND l_quantity < (SELECT 0.5 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17: correlated scalar AVG subquery against the same fact "
    "table — evaluated as a window avg after the part join (one lineitem "
    "scan) instead of Catalyst's decorrelated aggregate + join (two).",
    tags=("tpch", "subquery", "agg"),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The correlated avg is over ALL lineitem rows of the part, and the
    # part filters keep every lineitem row of a qualifying part in the
    # join output, so avg() OVER (PARTITION BY l_partkey) after the
    # broadcast join sees exactly the subquery's row set (guide §2.4 —
    # the decorrelated form scanned lineitem twice and aggregated avgs
    # for EVERY part, qualifying or not). l_quantity is integral, so
    # the avg's sum is exact in any order — filter decisions are
    # bit-identical to the subquery form (verified sf0.01/sf0.1).
    from pyspark.sql import Window

    t = _t(spark, sf_dir)
    p = t["part"].filter((F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL"))
    w = Window.partitionBy("l_partkey")
    return (
        t["lineitem"]
        .join(F.broadcast(p.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey"))
        .withColumn("__avg", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("__avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customer",
    """
    SELECT c_name, c_custkey, o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS orderdate,
           o_totalprice, round(sum(l_quantity), 2) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, orderdate, o_totalprice
    """,
    doc="TPC-H Q18: large-volume orders via IN over a grouped-HAVING "
    "subquery (decorrelates to semi join on orderkey).",
    tags=("tpch", "subquery", "agg"),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One lineitem pass instead of two (guide §2.4): the HAVING
    # subquery's per-order sum IS the output's sum_qty — o_orderkey is a
    # grouping key of the outer aggregate and every other key is
    # functionally dependent on it through the joins, so the final
    # GROUP BY collapses nothing. Reusing the aggregate drops the second
    # lineitem scan, the semi join, and the re-aggregation. Bit-exact:
    # l_quantity is integral (1..50), so the double sums are exact in
    # any summation order.
    t = _t(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("timestamp").alias("orderdate"),
            "o_totalprice",
            F.round(F.col("q"), 2).alias("sum_qty"),
        )
    )


@register(
    "q19_disjunctive_revenue",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
            AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
            AND l_quantity BETWEEN 20 AND 30))
    """,
    doc="TPC-H Q19: disjunction of conjunctive brand/size/quantity "
    "predicates across the join — Catalyst extracts the common p/l "
    "sub-predicates for pushdown on both sides.",
    tags=("tpch", "join", "predicate"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@register(
    "q20_potential_promotion",
    """
    SELECT s_name, n_name
    FROM supplier, nation
    WHERE s_nationkey = n_nationkey
      AND s_suppkey IN (SELECT l_suppkey
                        FROM lineitem, part
                        WHERE l_partkey = p_partkey AND p_name LIKE 'red%'
                          AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
                          AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
                        GROUP BY l_suppkey
                        HAVING sum(l_quantity) > 150)
    """,
    doc="TPC-H Q20 shape: suppliers with heavy shipped volume of matching "
    "parts — IN over a grouped-HAVING join subquery. Adaptation: shipped "
    "quantity from lineitem replaces partsupp availqty.",
    tags=("tpch", "subquery", "semi-join"),
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    heavy = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
        )
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("red%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
    )
    return (
        t["supplier"]
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


@register(
    "q21_waiting_supplier",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    doc="TPC-H Q21 shape: EXISTS + NOT EXISTS pair (semi + anti join) — the "
    "only supplier whose line shipped last in a multi-supplier order. "
    "Adaptation: lateness = shipdate after orderdate (no receiptdate).",
    tags=("tpch", "subquery", "semi-join", "anti-join", "topk"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
        """
    )


@register(
    "q22_sales_opportunity",
    """
    SELECT n_name AS cntry, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM customer, nation
    WHERE c_nationkey = n_nationkey
      AND c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND CAST(o_orderdate AS DATE) >= DATE '2000-01-01')
    GROUP BY n_name
    """,
    doc="TPC-H Q22 shape: above-average-balance customers with no recent orders "
    "(scalar subquery + anti join), grouped by nation (no phone prefix in "
    "schema).",
    tags=("tpch", "subquery", "anti-join", "agg"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name AS cntry, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND CAST(o_orderdate AS DATE) >= DATE '2000-01-01')
        GROUP BY n_name
        """
    )
