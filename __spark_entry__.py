"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``tiflink_spark.queries`` (and the registration
side-effect modules it imports); this file just adapts the registry
to the driver's three-function contract.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference's canonical MV shape: scalar correlated
    COUNT subquery, TiFlinkExample.java:10-16) on /root/testdata/sf0.001."""
    from tiflink_spark.queries import get_registry

    spec = get_registry()["flagship_correlated_count"]
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from tiflink_spark.queries import get_registry

    return {name: spec.fn for name, spec in get_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted (None) oracles are
    excluded so the driver records its rows-only check for them."""
    from tiflink_spark.queries import get_registry

    return {
        name: spec.oracle
        for name, spec in get_registry().items()
        if spec.oracle is not None
    }
