"""Connector registry: source/sink factories + options.

The reference wires sources and sinks through a Flink connector factory
keyed by ``connector=tiflink`` with an options bag (PD address,
timeouts, batch concurrency — TikvDynamicTableFactory.java:13-58,
TiFlinkOptions.java:19-101). The Spark analog: a small registry mapping
format names to reader/writer factories plus a typed options dataclass,
so engine code never hard-codes a storage format.

Built-in connectors:
- ``parquet``   — batch read/write (the testdata format)
- ``changelog`` — a directory of parquet changelog files (__op/__seq
  contract) readable as batch or as a file stream (the CDC-source
  analog, FlinkTikvConsumer.java:92-106)
- ``keyed``     — the versioned KeyedParquetStore (the upsert-sink
  analog, FlinkTikvProducer.java:39-258)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflink_spark.changelog import (
    OP_COL,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    SEQ_COL,
)
from tiflink_spark.store import KeyedParquetStore


@dataclass
class ConnectorOptions:
    """Options bag (TiFlinkOptions.java:19-101 analog)."""

    path: str
    pk: list[str] = field(default_factory=list)
    num_buckets: int = 16
    max_files_per_trigger: int = 1  # micro-batch granularity for streams
    range_partitions: int | None = None  # parallel range partitioning (op #6)
    extra: dict = field(default_factory=dict)


class Connector:
    name: str = "base"

    def read(self, spark: SparkSession, opts: ConnectorOptions) -> DataFrame:
        raise NotImplementedError

    def read_stream(self, spark: SparkSession, opts: ConnectorOptions) -> DataFrame:
        raise NotImplementedError

    def write(self, df: DataFrame, opts: ConnectorOptions) -> None:
        raise NotImplementedError


class ParquetConnector(Connector):
    name = "parquet"

    def read(self, spark: SparkSession, opts: ConnectorOptions) -> DataFrame:
        df = spark.read.parquet(opts.path)
        if opts.range_partitions:
            # Parallel range partitioning on the PK — the reference splits
            # the handle space evenly across subtasks
            # (TableKeyRangeUtils.java:17-42); Spark's equivalent is an
            # explicit range repartition for downstream co-location.
            df = df.repartitionByRange(opts.range_partitions, *opts.pk)
        return df

    def read_stream(self, spark: SparkSession, opts: ConnectorOptions) -> DataFrame:
        schema = spark.read.parquet(opts.path).schema
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", opts.max_files_per_trigger)
            .parquet(opts.path)
        )

    def write(self, df: DataFrame, opts: ConnectorOptions) -> None:
        writer = df.write.mode("overwrite")
        if opts.range_partitions:
            df = df.repartitionByRange(opts.range_partitions, *opts.pk)
            writer = df.write.mode("overwrite")
        writer.parquet(opts.path)


class ChangelogConnector(ParquetConnector):
    """Parquet directory carrying the __op/__seq changelog contract."""

    name = "changelog"

    def read(self, spark: SparkSession, opts: ConnectorOptions) -> DataFrame:
        df = super().read(spark, opts)
        missing = {OP_COL, SEQ_COL} - set(df.columns)
        if missing:
            raise ValueError(f"changelog at {opts.path} missing {sorted(missing)}")
        return df

    def read_stream(self, spark: SparkSession, opts: ConnectorOptions) -> DataFrame:
        df = super().read_stream(spark, opts)
        missing = {OP_COL, SEQ_COL} - set(df.columns)
        if missing:
            raise ValueError(f"changelog at {opts.path} missing {sorted(missing)}")
        return df


class KeyedStoreConnector(Connector):
    """Versioned keyed store (exactly-once upsert sink)."""

    name = "keyed"

    def open(self, spark: SparkSession, opts: ConnectorOptions) -> KeyedParquetStore:
        return KeyedParquetStore(spark, opts.path, opts.pk, opts.num_buckets)

    def read(self, spark: SparkSession, opts: ConnectorOptions) -> DataFrame:
        return self.open(spark, opts).read()

    def write(self, df: DataFrame, opts: ConnectorOptions) -> None:
        """Each write publishes a NEW version (batch id derived from the
        committed version — a fixed id would make every write after the
        first a silent idempotent no-op; the version is monotone even
        across manifest compaction, unlike the commit-line count)."""
        store = self.open(df.sparkSession, opts)
        v = store.current_version()
        store.bootstrap(df, batch_id=f"write-{0 if v is None else v + 1}")


class CsvConnector(Connector):
    """CSV source/sink. Schema comes from ``opts.extra['schema']`` when
    given (a StructType or DDL string) — inference is a full extra pass
    over the data, which at 100 TB is a job of its own; declared schemas
    are the scale path. Header on, so files are self-describing."""

    name = "csv"

    def _reader(self, spark: SparkSession, opts: ConnectorOptions):
        r = spark.read.option("header", "true")
        schema = opts.extra.get("schema")
        return r.schema(schema) if schema is not None else r.option("inferSchema", "true")

    def read(self, spark: SparkSession, opts: ConnectorOptions) -> DataFrame:
        return self._reader(spark, opts).csv(opts.path)

    def read_stream(self, spark: SparkSession, opts: ConnectorOptions) -> DataFrame:
        schema = opts.extra.get("schema")
        if schema is None:
            schema = spark.read.option("header", "true").option("inferSchema", "true").csv(
                opts.path
            ).schema
        return (
            spark.readStream.schema(schema)
            .option("header", "true")
            .option("maxFilesPerTrigger", opts.max_files_per_trigger)
            .csv(opts.path)
        )

    def write(self, df: DataFrame, opts: ConnectorOptions) -> None:
        df.write.mode("overwrite").option("header", "true").csv(opts.path)


class JsonConnector(Connector):
    """JSON-lines source/sink; same declared-schema rule as CSV."""

    name = "json"

    def read(self, spark: SparkSession, opts: ConnectorOptions) -> DataFrame:
        schema = opts.extra.get("schema")
        r = spark.read
        return (r.schema(schema) if schema is not None else r).json(opts.path)

    def read_stream(self, spark: SparkSession, opts: ConnectorOptions) -> DataFrame:
        schema = opts.extra.get("schema")
        if schema is None:
            schema = spark.read.json(opts.path).schema
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", opts.max_files_per_trigger)
            .json(opts.path)
        )

    def write(self, df: DataFrame, opts: ConnectorOptions) -> None:
        df.write.mode("overwrite").json(opts.path)


class RateChangelogConnector(Connector):
    """Scripted CDC generator over Spark's ``rate-micro-batch`` source —
    proof that the engine's ``read_stream`` contract is source-agnostic,
    not a parquet-directory artifact (the reference consumes live TiKV
    CDC the same way, FlinkTikvConsumer.java:92-131; swap this for a
    Kafka reader by changing only the ``readStream.format`` line).

    Emits the standard ``__op``/``__seq`` upsert-changelog contract
    (+I/+U/-D, no UPDATE_BEFORE — TikvDynamicSource.java:47-53) with a
    deterministic three-phase script over ``extra['total']`` sequence
    numbers and ``extra['num_keys']`` keys:

      phase 0  (+I)  every key inserted
      phase 1  (+U)  every key's amount updated
      phase 2  (-D)  keys ≡ 0 (mod 3) deleted; the rest updated again

    The final state is a pure function of (total, num_keys) no matter
    how the micro-batches split, because ``__seq`` is the global
    sequence number — that determinism is what makes a live-source
    stream oracle-checkable. ``read()`` is the batch dual (same rows
    from ``spark.range``), so stream-vs-batch parity is testable.
    """

    name = "rate-changelog"

    @staticmethod
    def _script(df: DataFrame, total: int, num_keys: int) -> DataFrame:
        third = total // 3
        value = F.col("value")
        key = (value % num_keys).alias("key")
        phase = F.floor(value / F.lit(third))
        op = (
            F.when(phase == 0, F.lit(OP_INSERT))
            .when(phase == 1, F.lit(OP_UPDATE))
            .otherwise(
                F.when((value % num_keys) % 3 == 0, F.lit(OP_DELETE)).otherwise(
                    F.lit(OP_UPDATE)
                )
            )
        )
        return df.filter(value < total).select(
            key,
            value.cast("double").alias("amount"),
            op.alias(OP_COL),
            value.cast("long").alias(SEQ_COL),
        )

    def _params(self, opts: ConnectorOptions) -> tuple[int, int, int]:
        return (
            int(opts.extra.get("total", 3000)),
            int(opts.extra.get("num_keys", 500)),
            int(opts.extra.get("rows_per_batch", 600)),
        )

    def read(self, spark: SparkSession, opts: ConnectorOptions) -> DataFrame:
        total, num_keys, _ = self._params(opts)
        return self._script(
            spark.range(total).select(F.col("id").alias("value")), total, num_keys
        )

    def read_stream(self, spark: SparkSession, opts: ConnectorOptions) -> DataFrame:
        total, num_keys, rows_per_batch = self._params(opts)
        src = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", rows_per_batch)
            .option("startTimestamp", 0)
            .option("numPartitions", int(opts.extra.get("num_partitions", 4)))
            .load()
        )
        return self._script(src, total, num_keys)


def jdbc_execute(spark: SparkSession, url: str, *statements: str) -> None:
    """Execute DDL/DML statements over JDBC through the driver JVM.

    The reference's target-side bootstrap runs generated DDL against the
    database the same way (TiJDBCHelper.java:111-140, executeUpdate over
    the JDBC session); Spark has no DDL surface for JDBC sources, so
    this goes through java.sql directly. Driver-side only — never in a
    task."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            for sql in statements:
                st.execute(sql)
        finally:
            st.close()
    finally:
        conn.close()


def jdbc_primary_key(spark: SparkSession, url: str, table: str) -> list[str]:
    """Reflect a table's PRIMARY KEY column list via JDBC metadata.

    The analog of the reference reading the primary index out of
    INFORMATION_SCHEMA / the TiDB catalog (TiJDBCHelper.java:47-85,
    TiFlinkCatalog.java:382-403). Uses DatabaseMetaData.getPrimaryKeys,
    so it works against any JDBC database (Derby in-sandbox; TiDB/MySQL/
    Postgres in production) without dialect-specific system-table SQL.
    Identifier case folding follows the database (Derby upper-cases
    unquoted names); callers match case-insensitively."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        # Unquoted identifiers fold per-database; try stored-case first,
        # then the common folds.
        meta = conn.getMetaData()
        for cand in (table, table.upper(), table.lower()):
            rs = meta.getPrimaryKeys(None, None, cand)
            cols: list[tuple[int, str]] = []
            while rs.next():
                cols.append((rs.getInt("KEY_SEQ"), rs.getString("COLUMN_NAME")))
            rs.close()
            if cols:
                return [c for _, c in sorted(cols)]
        return []
    finally:
        conn.close()


def jdbc_poll_changes(
    spark: SparkSession, url: str, table: str, since_seq: int
) -> DataFrame:
    """Poll a database OUTBOX table for committed change rows — the
    JDBC-only analog of consuming the reference's live CDC event stream
    (FlinkTikvConsumer.java:92-131): when the only access to the source
    database is a JDBC session, changes are captured by a transactional
    outbox carrying the row payload plus the changelog contract columns
    (``__op`` VARCHAR, ``__seq`` BIGINT monotone — the resolved-ts
    analog). Each poll reads rows with ``__seq > since_seq`` — the
    predicate ships inside the JDBC subquery, so the database does the
    filtering; the caller applies the batch and records the max
    ``__seq`` it consumed, exactly the consumer's resolvedTs bookkeeping
    (FlinkTikvConsumer.java:108-131). Quoted lower-case column names
    keep the contract identical across case-folding databases."""
    sub = f'(SELECT * FROM {table} WHERE "__seq" > {int(since_seq)}) chg'
    return (
        spark.read.format("jdbc").option("url", url).option("dbtable", sub).load()
    )


class JdbcConnector(Connector):
    """JDBC source/sink — the engine's analog of the reference's sole
    entry point, a live database session (TiJDBCHelper.java:47-140).

    ``opts.path`` is the JDBC URL; ``opts.extra`` must carry ``table``
    (the dbtable). Parallel range reads — the reference's even split of
    the key space across subtasks (TableKeyRangeUtils.java:17-42) — are
    expressed through Spark's JDBC partitioning options: set
    ``opts.range_partitions`` plus ``extra['partitionColumn']``/
    ``lowerBound``/``upperBound`` and every executor reads its own key
    range directly from the database. Without them the read is a single
    partition (fine for dims; wrong for facts at scale)."""

    name = "jdbc"

    _PASSTHROUGH = (
        "driver",
        "partitionColumn",
        "lowerBound",
        "upperBound",
        "numPartitions",
        "fetchsize",
        "queryTimeout",
        "sessionInitStatement",
    )

    def _base(self, reader_or_writer, opts: ConnectorOptions):
        out = reader_or_writer.format("jdbc").option("url", opts.path).option(
            "dbtable", opts.extra["table"]
        )
        for k in self._PASSTHROUGH:
            if k in opts.extra:
                out = out.option(k, opts.extra[k])
        if opts.range_partitions and "partitionColumn" in opts.extra:
            out = out.option("numPartitions", opts.range_partitions)
        return out

    def read(self, spark: SparkSession, opts: ConnectorOptions) -> DataFrame:
        return self._base(spark.read, opts).load()

    def write(self, df: DataFrame, opts: ConnectorOptions) -> None:
        mode = opts.extra.get("mode", "append")
        self._base(df.write.mode(mode), opts).save()


_REGISTRY: dict[str, Connector] = {}


def register_connector(conn: Connector) -> None:
    _REGISTRY[conn.name] = conn


def get_connector(name: str) -> Connector:
    if name not in _REGISTRY:
        raise KeyError(f"unknown connector '{name}' (have: {sorted(_REGISTRY)})")
    return _REGISTRY[name]


for _c in (
    ParquetConnector(),
    ChangelogConnector(),
    KeyedStoreConnector(),
    CsvConnector(),
    JsonConnector(),
    JdbcConnector(),
    RateChangelogConnector(),
):
    register_connector(_c)
