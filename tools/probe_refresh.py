"""Refresh-crossover scale probe: flagship + star, uniform/clustered/
dim churn, incremental vs recompute — the reproducible form of the
r8/r9 sf10 measurements (BENCH_idle mv_refresh_sf10_crossover).

Usage:
    python tools/make_sf.py /tmp/sf10 100        # once
    python tools/probe_refresh.py /tmp/sf10 [churn ...]

churn in {uniform, clustered, dim}; default runs all three.
- uniform:   every-1000th-orderkey churn — hash-spread, pruning-hostile
  (the retraction lookup's BETWEEN superset degrades to a full scan).
- clustered: contiguous recent-key churn in the top replica band —
  realistic CDC; row-group min/max pruning bounds the lookup.
- dim:       1%% of customers change nation — recompute re-joins the
  whole fact, incremental re-derives only the changed keys' fan-out.

Prints one JSON line per (churn, route) pair and a FINAL summary line.
Timings are min-of-2 rounds of 3 scripted batches (see
bench._mv_refresh_block for the protocol rationale).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from tiflink_spark.app import MVApp  # noqa: E402
from tiflink_spark.changelog import (  # noqa: E402
    OP_COL,
    OP_DELETE,
    OP_UPDATE,
    SEQ_COL,
)
from tiflink_spark.session import get_spark, load_tables  # noqa: E402

O_STRIDE = 100_000_000  # tools/make_sf.py's orderkey stride


def _mat(df):
    return df.withColumn(SEQ_COL, F.monotonically_increasing_id()).localCheckpoint(
        eager=True
    )


def make_batches(t, churn: str, replicas: int):
    orders, cust = t["orders"], t["customer"]
    if churn == "uniform":
        out = []
        for op, mod in ((OP_UPDATE, 0), (OP_UPDATE, 1), (OP_DELETE, 2)):
            b = orders.filter(F.col("o_orderkey") % 1000 == mod)
            if op == OP_UPDATE:
                b = b.withColumn("o_totalprice", F.col("o_totalprice") + 10.0)
            out.append(("orders", _mat(b.withColumn(OP_COL, F.lit(op)))))
        return out
    if churn == "clustered":
        lo = (replicas - 1) * O_STRIDE
        out = []
        for op, mod in ((OP_UPDATE, 0), (OP_UPDATE, 1), (OP_DELETE, 2)):
            b = orders.filter(
                (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") % 10 == mod)
            )
            if op == OP_UPDATE:
                b = b.withColumn("o_totalprice", F.col("o_totalprice") + 10.0)
            out.append(("orders", _mat(b.withColumn(OP_COL, F.lit(op)))))
        return out
    if churn == "dim":
        out = []
        for mod in (0, 1, 2):
            b = (
                cust.filter(F.col("c_custkey") % 100 == mod)
                .withColumn("c_nationkey", (F.col("c_nationkey") + 1 + mod) % 25)
                .withColumn(OP_COL, F.lit(OP_UPDATE))
            )
            out.append(("customer", _mat(b)))
        return out
    raise ValueError(churn)


def flagship(b, t):
    return b.source("ord_b", t["orders"], pk=["o_orderkey"]).source(
        "cust_b", t["customer"], pk=["c_custkey"]
    ).query(
        """SELECT c_custkey, c_name,
                  (SELECT count(*) FROM ord_b o
                   WHERE o.o_custkey = c.c_custkey) AS order_cnt
           FROM cust_b c"""
    )


def star(b, t):
    return b.source("ord_b", t["orders"], pk=["o_orderkey"]).source(
        "cust_b", t["customer"], pk=["c_custkey"]
    ).source("nat_b", t["nation"], pk=["n_nationkey"]).query(
        """SELECT n.n_name, count(*) AS n_orders,
                  sum(o.o_totalprice) AS total_raw
           FROM ord_b o
             JOIN cust_b c ON o.o_custkey = c.c_custkey
             JOIN nat_b n ON c.c_nationkey = n.n_nationkey
           GROUP BY n.n_name"""
    )


NAME_MAP = {"orders": "ord_b", "customer": "cust_b"}


def run(spark, t, make, batches, force_recompute: bool) -> dict:
    work = tempfile.mkdtemp(prefix="probe_mv_")
    try:
        b = make(MVApp.builder(spark), t).target(work).num_buckets(8).shuffle_partitions(8)
        if force_recompute:
            b = b.force_recompute()
        app = b.build()
        t0 = time.perf_counter()
        app.bootstrap()
        boot = round(time.perf_counter() - t0, 2)
        best, secs_best = None, None
        for rnd in range(2):
            secs = []
            for i, (tbl, ch) in enumerate(batches, start=1 + rnd * 10):
                t0 = time.perf_counter()
                app.refresh({NAME_MAP[tbl]: ch}, batch_id=i)
                secs.append(round(time.perf_counter() - t0, 3))
            tot = sum(secs)
            if best is None or tot < best:
                best, secs_best = tot, secs
        return {"boot": boot, "refresh_secs": secs_best, "total": round(best, 3)}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    churns = sys.argv[2:] or ["uniform", "clustered", "dim"]
    spark = get_spark("probe_refresh")
    t = load_tables(spark, sf_dir)
    n_orders = t["orders"].count()
    replicas = max(1, round(n_orders / 150_000))  # sf0.1 = 150k orders/replica
    out: dict = {"sf_dir": sf_dir, "orders_rows": n_orders}
    for churn in churns:
        batches = make_batches(t, churn, replicas)
        # dim churn has no flagship leg: the flagship's dim (customer)
        # churn exercises a different route family; keep the probe on
        # the two VERDICT routes
        routes = {"flagship": flagship, "star": star}
        out[churn] = {}
        for rname, make in routes.items():
            if churn == "dim" and rname == "flagship":
                continue
            inc = run(spark, t, make, batches, False)
            rec = run(spark, t, make, batches, True)
            rec_t, inc_t = rec["total"], inc["total"]
            entry = {
                "inc": inc,
                "rec": rec,
                "speedup": round(rec_t / inc_t, 2) if inc_t else None,
            }
            out[churn][rname] = entry
            print(json.dumps({churn: {rname: entry}}), flush=True)
    print("FINAL " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
