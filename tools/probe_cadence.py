"""Steady-state refresh-cadence probe: ONE warm MVApp, a long run of
micro-batches, per-batch wall time — the regime the reference's
1s-checkpoint refresh loop lives in (TiFlinkExample.java:22-23), and
the number BENCH_idle's cadence_note reports. The bench-protocol
mv_refresh block (fresh app per round, min-of-2) deliberately measures
the COLD shape; this probe measures the warm floor the r9/r10
driver-floor work targets.

Usage:
    python tools/probe_cadence.py [sf_dir] [n_batches] [--profile]

- sf_dir     default /root/testdata/sf0.1
- n_batches  default 12 (cycled from 6 distinct scripted batches so
             plan/codegen caches see repeated SHAPES, like a real loop)
- --profile  cProfile the LAST batch, print the top driver-side
             cumulative entries (the py4j / plan-construction split).

Prints one JSON line: {"per_batch": [...], "min": s, "median": s,
"mean_tail": s} where mean_tail averages batches after the first two
(warm steady state).
"""

from __future__ import annotations

import json
import shutil
import statistics
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


def _mat(df):
    return df.withColumn(
        SEQ_COL, F.monotonically_increasing_id()
    ).localCheckpoint(eager=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    profile = "--profile" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    n_batches = int(args[1]) if len(args) > 1 else 12
    spark = get_spark("probe_cadence")
    t = load_tables(spark, sf_dir)
    orders, cust = t["orders"], t["customer"]

    # six distinct micro-batches cycled — each ~0.1% of orders, the
    # same churn density as bench's mv_refresh block
    scripted = []
    for i, (op, mod) in enumerate(
        (
            (OP_UPDATE, 0),
            (OP_UPDATE, 1),
            (OP_DELETE, 2),
            (OP_UPDATE, 3),
            (OP_DELETE, 4),
            (OP_UPDATE, 5),
        )
    ):
        b = orders.filter(F.col("o_orderkey") % 1000 == mod)
        if op == OP_UPDATE:
            b = b.withColumn("o_totalprice", F.col("o_totalprice") + 10.0 + i)
        scripted.append(_mat(b.withColumn(OP_COL, F.lit(op))))

    work = tempfile.mkdtemp(prefix="cadence_")
    try:
        app = (
            MVApp.builder(spark)
            .source("ord_b", orders, pk=["o_orderkey"])
            .source("cust_b", cust, pk=["c_custkey"])
            .query(
                """SELECT c_custkey, c_name,
                          (SELECT count(*) FROM ord_b o
                           WHERE o.o_custkey = c.c_custkey) AS order_cnt
                   FROM cust_b c"""
            )
            .target(work)
            .num_buckets(8)
            .shuffle_partitions(8)
            .build()
        )
        t0 = time.perf_counter()
        app.bootstrap()
        boot = round(time.perf_counter() - t0, 3)
        per_batch = []
        for i in range(1, n_batches + 1):
            ch = scripted[(i - 1) % len(scripted)]
            if profile and i == n_batches:
                import cProfile
                import pstats

                pr = cProfile.Profile()
                pr.enable()
                t0 = time.perf_counter()
                app.refresh({"ord_b": ch}, batch_id=i)
                per_batch.append(round(time.perf_counter() - t0, 3))
                pr.disable()
                stats = pstats.Stats(pr)
                stats.sort_stats("cumulative")
                print("== cProfile (last batch, top cumulative) ==")
                stats.print_stats(30)
            else:
                t0 = time.perf_counter()
                app.refresh({"ord_b": ch}, batch_id=i)
                per_batch.append(round(time.perf_counter() - t0, 3))
        tail = per_batch[2:] or per_batch
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "bootstrap_sec": boot,
                    "per_batch": per_batch,
                    "min": min(per_batch),
                    "median": round(statistics.median(per_batch), 3),
                    "mean_tail": round(sum(tail) / len(tail), 3),
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
