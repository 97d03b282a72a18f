"""tiflink_spark — a PySpark-native materialized-view / analytics engine.

Re-expresses the capabilities of the reference engine (TiFlink: a
strongly-consistent Flink->TiKV materialized-view maintainer, see
/root/reference/README.md:3-16) on top of Spark SQL + Structured
Streaming:

- ``catalog``   — name -> (path, schema, primary key) registry
  (reference: TiFlinkCatalog.java:46).
- ``changelog`` — upsert changelog conventions (``__op`` in +I/+U/-D,
  no -U; reference: TikvDynamicSource.java:47-53).
- ``store``     — hash-bucketed, versioned keyed parquet store with
  MERGE-by-PK; the Spark-native stand-in for TiFlink's Percolator 2PC
  sink (FlinkTikvProducer.java:39-258). Exactly-once comes from
  idempotent, batch_id-versioned publishes instead of a transaction
  coordinator (GrpcService.java:40-160).
- ``mv``        — IncrementalAggMV / RecomputeMV: batch bootstrap +
  per-micro-batch maintenance with idempotent MERGE publishes
  (reference lifecycle: TiFlinkApp.java:70-116).
- ``incremental`` — retraction-aware delta maintenance for aggregates
  (COUNT/SUM/AVG delta-merged; MIN/MAX dirty-group recompute).
- ``types``     — MySQL<->Spark type map + MV target DDL generation
  (reference: TypeUtils.java:46-109, 364-406).
- ``app``       — MVApp builder: the user-facing continuous-MV API
  (reference: TiFlinkApp.Builder).
- ``planner``   — maintenance-strategy planner: routes the canonical
  GROUP-BY shape and the flagship correlated-COUNT shape to true
  incremental maintenance, everything else to the explicit recompute
  fallback (the API-layer analog of delegating incremental planning
  to Flink, TiFlinkApp.java:270).
- ``connectors`` — source/sink factory registry (parquet / changelog /
  keyed store / csv / json).
- ``bucketing`` — bucketed co-located joins + salted skew joins.
- ``multimodal`` — binary media columns with Arrow-batched decode /
  resize / feature-extract / frame-sample stages (real libraries
  stubbed; plumbing fully testable via deterministic stand-ins).
- ``queries*`` — the oracle-checked query surface: relational + TPC-H
  Q1-Q22 shapes, MV convergence gates, streaming, and the
  beyond-reference LLM-data-pipeline pack (dedup x5 incl. SimHash and
  embedding-cosine, similarity search brute/LSH/IVF, text analysis,
  multimodal plumbing).

Everything here is public-knowledge PySpark; no code is copied from the
reference (which is a Java/Flink codebase with a different execution
model).
"""

from tiflink_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]
