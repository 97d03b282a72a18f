"""Catalog: name → (path, schema, primary key) registry.

The reference reflects TiDB's catalog into Flink so source tables are
queryable by name, with the PK taken from the primary index or
primary-flagged columns (TiFlinkCatalog.java:92-198, 382-403). Here a
table is a parquet path plus engine metadata — Spark doesn't enforce
PKs, so the PK is catalog metadata the MV engine keys its stores by.

MV schema inference mirrors TiFlinkApp.java:270-287: column names come
from the resolved query plan (``df.schema``), the PK defaults to the
**first output column** when the query doesn't carry one
(TiFlinkApp.java:276-281).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


@dataclass
class TableSpec:
    name: str
    path: str | None  # parquet location; None for view-only registrations
    schema: StructType | None = None
    pk: list[str] = field(default_factory=list)
    # True for a registered MV target — the catalog's "view" entries,
    # mirroring TiFlinkCatalog.listViews (TiFlinkCatalog.java:156-166),
    # which reflects source-side views alongside tables.
    is_view: bool = False


def default_pk(schema: StructType, declared: list[str] | None = None) -> list[str]:
    """PK-defaulting rule: declared PK if valid, else the first column
    (TiFlinkApp.java:276-281). An explicit empty list means the table is
    keyless (append-only fact) — it can be scanned and joined but cannot
    back a keyed MV store."""
    names = [f.name for f in schema.fields]
    if declared is not None:
        missing = [c for c in declared if c not in names]
        if missing:
            raise ValueError(f"pk columns not in schema: {missing}")
        return list(declared)
    return names[:1]


class Catalog:
    """Registry of source tables and MV targets for one engine instance."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, TableSpec] = {}

    def _bind_view(self, name: str, df: DataFrame) -> None:
        from tiflink_spark.session import TABLES, invalidate_table_views

        df.createOrReplaceTempView(name)
        if name in TABLES:
            # The name shadows a standard testdata table: make the next
            # load_tables() re-register rather than trust its skip cache.
            invalidate_table_views(self.spark)

    def register_parquet(self, name: str, path: str, pk: list[str] | None = None) -> TableSpec:
        from tiflink_spark.session import read_parquet_normalized

        if not os.path.exists(path):
            raise FileNotFoundError(path)
        df = read_parquet_normalized(self.spark, path)
        spec = TableSpec(name=name, path=path, schema=df.schema, pk=default_pk(df.schema, pk))
        self._tables[name] = spec
        self._bind_view(name, df)
        return spec

    def register_jdbc(
        self,
        name: str,
        url: str,
        table: str | None = None,
        pk: list[str] | None = None,
        **jdbc_options,
    ) -> TableSpec:
        """Reflect a JDBC table into the catalog — the reference's
        primary registration path (TiFlinkCatalog.java:92-198 reflects
        TiDB's catalog over JDBC; TiJDBCHelper.java:47-85 reads the
        primary index). Schema comes from the JDBC metadata (no data
        scan); the PK, when not declared, is reflected from
        DatabaseMetaData.getPrimaryKeys and matched case-insensitively
        against the reflected schema."""
        from tiflink_spark.connectors import (
            ConnectorOptions,
            get_connector,
            jdbc_primary_key,
        )

        table = table or name
        opts = ConnectorOptions(path=url, extra={"table": table, **jdbc_options})
        df = get_connector("jdbc").read(self.spark, opts)
        if pk is None:
            reflected = jdbc_primary_key(self.spark, url, table)
            by_lower = {c.lower(): c for c in df.columns}
            # No PK in the database -> None -> first-column default rule
            # (TiFlinkApp.java:276-281), not an explicit keyless table.
            pk = [by_lower[c.lower()] for c in reflected if c.lower() in by_lower] or None
        spec = TableSpec(name=name, path=None, schema=df.schema, pk=default_pk(df.schema, pk))
        self._tables[name] = spec
        self._bind_view(name, df)
        return spec

    def register_dataframe(self, name: str, df: DataFrame, pk: list[str] | None = None) -> TableSpec:
        spec = TableSpec(name=name, path=None, schema=df.schema, pk=default_pk(df.schema, pk))
        self._tables[name] = spec
        self._bind_view(name, df)
        return spec

    def get(self, name: str) -> TableSpec:
        return self._tables[name]

    def __contains__(self, name: str) -> bool:
        return name in self._tables

    def register_view(
        self, name: str, app, pk: list[str] | None = None
    ) -> TableSpec:
        """Register a maintained MV (an :class:`~tiflink_spark.app.MVApp`)
        as a catalog VIEW: queryable by name like any table, listed by
        :meth:`list_views` — the engine-side analog of
        ``TiFlinkCatalog.listViews`` (TiFlinkCatalog.java:156-166).
        Every MV target is itself a consumable table in the reference
        (README.md:8-16); registering it closes that loop here."""
        df = app.read()
        out_names = {f.name for f in df.schema.fields}
        if pk is None and set(app.mv_pk) <= out_names:
            pk = list(app.mv_pk)  # hidden engine keys fall back to rule
        spec = TableSpec(
            name=name, path=None, schema=df.schema,
            pk=default_pk(df.schema, pk), is_view=True,
        )
        self._tables[name] = spec
        self._bind_view(name, df)
        return spec

    def list_tables(self) -> list[str]:
        return sorted(n for n, s in self._tables.items() if not s.is_view)

    def list_views(self) -> list[str]:
        """Names of registered MV targets (TiFlinkCatalog.java:156-166)."""
        return sorted(n for n, s in self._tables.items() if s.is_view)

    def table(self, name: str) -> DataFrame:
        from tiflink_spark.session import read_parquet_normalized

        spec = self._tables[name]
        if spec.path is not None:
            return read_parquet_normalized(self.spark, spec.path)
        return self.spark.table(name)
