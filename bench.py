"""Headline benchmark.

Runs one query per major operator family at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Materialization is ``df.write.format("noop")`` — full execution of the
final plan on the executors with zero driver-side result pull, so the
timing measures the query, not the collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_correlated_count",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q18_large_volume_customer",
    "join_inner",
    "window_rank",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality_score",
    "embedding_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tiflink_spark.queries import get_registry
    from tiflink_spark.session import get_spark

    spark = get_spark("bench")
    registry = get_registry()
    names = [n for n in HEADLINE if n in registry]

    # Warm the JVM, parquet footers, OS page cache, and codegen once so
    # timings measure the queries, not first-touch I/O: materialize every
    # table fully (all columns), then one representative query.
    from tiflink_spark.session import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.write.format("noop").mode("overwrite").save()
    registry[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Warm the Python worker pool + Arrow serialization path the same
    # way (spark.python.worker.reuse keeps the workers alive): the
    # pandas-backed operators otherwise pay ~1.5s of one-time worker
    # fork/import inside their first measured run.
    spark.range(1000).mapInPandas(
        lambda batches: batches, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # Steady-state timing: run each query once unmeasured (whole-stage
    # codegen compiles the generated classes on first execution — ~1-2s
    # of one-time JVM compiler work per distinct plan, pure noise at the
    # target scale where a query runs for minutes), then measure the
    # second run. Spark has no cross-action result caching — the
    # measured run re-executes the full plan (scan/shuffle/agg); only
    # the JIT/codegen classes and page cache are warm, exactly like the
    # table warm-up above.
    timings: dict[str, float] = {}
    for name in names:
        registry[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        df = registry[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
