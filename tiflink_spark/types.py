"""MySQL↔Spark type mapping (SURVEY §1.3).

The reference converts TiDB column types to Flink types column-by-
column (TypeUtils.java:46-109, nullability at :106-109) and back to
MySQL DDL strings for MV target creation (TypeUtils.java:364-406,
VARCHAR/VARBINARY length tiering at :391-406). This module is the
PySpark analog: a declarative map both directions, used by the catalog
when reflecting external schemas and generating target DDL.
"""

from __future__ import annotations

from pyspark.sql import types as T

# (mysql_type_lower, unsigned) -> Spark type factory. Length/precision
# handled in mysql_to_spark. Mirrors TypeUtils.java:46-104 case order.
_SIMPLE = {
    ("bit", False): T.BooleanType(),
    ("tinyint", False): T.ByteType(),
    ("tinyint", True): T.ShortType(),
    ("year", False): T.ShortType(),
    ("smallint", False): T.ShortType(),
    ("smallint", True): T.IntegerType(),
    ("mediumint", False): T.IntegerType(),
    ("mediumint", True): T.IntegerType(),
    ("int", False): T.IntegerType(),
    ("int", True): T.LongType(),
    ("bigint", False): T.LongType(),
    ("float", False): T.FloatType(),
    ("double", False): T.DoubleType(),
    ("datetime", False): T.TimestampType(),
    ("timestamp", False): T.TimestampType(),
    ("date", False): T.DateType(),
    # MySQL TIME (TypeDuration -> Flink TIME, TypeUtils.java:77-78):
    # Spark has no TimeType -> nanos-of-day as LONG (documented).
    ("time", False): T.LongType(),
    ("json", False): T.StringType(),
    ("enum", False): T.StringType(),
    ("set", False): T.StringType(),
    ("text", False): T.StringType(),
    ("tinytext", False): T.StringType(),
    ("mediumtext", False): T.StringType(),
    ("longtext", False): T.StringType(),
    ("blob", False): T.BinaryType(),
    ("tinyblob", False): T.BinaryType(),
    ("mediumblob", False): T.BinaryType(),
    ("longblob", False): T.BinaryType(),
    ("binary", False): T.BinaryType(),
    ("varbinary", False): T.BinaryType(),
    ("char", False): T.StringType(),
    ("varchar", False): T.StringType(),
}


def mysql_to_spark(
    mysql_type: str,
    *,
    unsigned: bool = False,
    length: int | None = None,
    precision: int | None = None,
    scale: int | None = None,
    nullable: bool = True,
) -> T.StructField | T.DataType:
    """Map a MySQL/TiDB column type to a Spark type.

    Special cases mirror the reference:
    - tinyint(1) -> BOOLEAN (TypeUtils.java:50-55)
    - unsigned bigint -> DECIMAL(20,0) (TypeUtils.java:63-64)
    - decimal(p,s) -> DECIMAL(p,s) (TypeUtils.java:96-98)
    - geometry -> unsupported, raises (TypeUtils.java:99-102)
    """
    t = mysql_type.strip().lower()
    if t == "geometry":
        raise ValueError("geometry is unsupported (reference parity: TypeUtils.java:99-102)")
    if t == "tinyint" and length == 1 and not unsigned:
        return T.BooleanType()
    if t == "bigint" and unsigned:
        return T.DecimalType(20, 0)
    if t in ("decimal", "numeric"):
        return T.DecimalType(precision if precision is not None else 10, scale or 0)
    key = (t, unsigned)
    if key in _SIMPLE:
        return _SIMPLE[key]
    if (t, False) in _SIMPLE:
        return _SIMPLE[(t, False)]
    raise ValueError(f"unmapped MySQL type: {mysql_type}")


# VARCHAR length tiering thresholds (TypeUtils.java:391-406).
_TEXT_TIER = 64 * 1024  # above VARCHAR(64k) -> MEDIUMTEXT
_LONGTEXT_TIER = 16 * 1024 * 1024  # above 16 MiB -> LONGTEXT


def spark_to_mysql(dt: T.DataType, *, length: int | None = None) -> str:
    """Map a Spark type to a MySQL DDL type string (TypeUtils.java:364-406)."""
    if isinstance(dt, T.BooleanType):
        return "TINYINT(1)"
    if isinstance(dt, T.ByteType):
        return "TINYINT"
    if isinstance(dt, T.ShortType):
        return "SMALLINT"
    if isinstance(dt, T.IntegerType):
        return "INT"
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.FloatType):
        return "FLOAT"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE"
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, T.TimestampType):
        return "DATETIME"
    if isinstance(dt, T.StringType):
        n = length or 255
        if n > _LONGTEXT_TIER:
            return "LONGTEXT"
        if n > _TEXT_TIER:
            return "MEDIUMTEXT"
        return f"VARCHAR({n})"
    if isinstance(dt, T.BinaryType):
        n = length or 255
        if n > _LONGTEXT_TIER:
            return "LONGBLOB"
        if n > _TEXT_TIER:
            return "MEDIUMBLOB"
        return f"VARBINARY({n})"
    raise ValueError(f"no MySQL DDL mapping for Spark type {dt.simpleString()}")


def create_table_ddl(table: str, schema: T.StructType, pk: list[str]) -> str:
    """CREATE TABLE DDL from an MV's resolved schema — the target-table
    bootstrap the reference performs over JDBC (TiJDBCHelper.java:111-140,
    SQL template at :37-40)."""
    cols = ",\n  ".join(
        f"`{f.name}` {spark_to_mysql(f.dataType)}{'' if f.nullable else ' NOT NULL'}"
        for f in schema.fields
    )
    pk_clause = f",\n  PRIMARY KEY ({', '.join(f'`{c}`' for c in pk)})" if pk else ""
    return f"CREATE TABLE IF NOT EXISTS `{table}` (\n  {cols}{pk_clause}\n)"
