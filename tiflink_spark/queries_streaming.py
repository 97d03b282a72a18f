"""Streaming / materialized-view queries.

These run the actual incremental engine (Structured Streaming +
foreachBatch MERGE) to a final state and return it as a DataFrame, so
the driver's DuckDB oracle can verify that *incremental maintenance
converges to the batch answer* — the property the reference's whole
consistency machinery exists to guarantee (README.md:18-22).

Populated once tiflink_spark.mv lands (registered via queries.register).
"""

from __future__ import annotations
