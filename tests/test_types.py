"""Type map (SURVEY §1.3, TypeUtils.java:46-109/364-406 analog) and
the PK-defaulting rule (TiFlinkApp.java:276-281)."""

import pytest
from pyspark.sql import types as T

from tiflink_spark.catalog import default_pk
from tiflink_spark.types import create_table_ddl, mysql_to_spark, spark_to_mysql


@pytest.mark.parametrize(
    "mysql,kwargs,expected",
    [
        ("bit", {}, T.BooleanType()),
        ("tinyint", {"length": 1}, T.BooleanType()),
        ("tinyint", {}, T.ByteType()),
        ("tinyint", {"unsigned": True}, T.ShortType()),
        ("smallint", {}, T.ShortType()),
        ("smallint", {"unsigned": True}, T.IntegerType()),
        ("year", {}, T.ShortType()),
        ("mediumint", {}, T.IntegerType()),
        ("int", {}, T.IntegerType()),
        ("int", {"unsigned": True}, T.LongType()),
        ("bigint", {}, T.LongType()),
        ("bigint", {"unsigned": True}, T.DecimalType(20, 0)),
        ("float", {}, T.FloatType()),
        ("double", {}, T.DoubleType()),
        ("datetime", {}, T.TimestampType()),
        ("timestamp", {}, T.TimestampType()),
        ("date", {}, T.DateType()),
        ("time", {}, T.LongType()),  # nanos-of-day, documented
        ("json", {}, T.StringType()),
        ("enum", {}, T.StringType()),
        ("varchar", {"length": 255}, T.StringType()),
        ("longblob", {}, T.BinaryType()),
        ("decimal", {"precision": 12, "scale": 3}, T.DecimalType(12, 3)),
    ],
)
def test_mysql_to_spark(mysql, kwargs, expected):
    assert mysql_to_spark(mysql, **kwargs) == expected


def test_geometry_unsupported():
    with pytest.raises(ValueError, match="geometry"):
        mysql_to_spark("geometry")


@pytest.mark.parametrize(
    "dt,kwargs,expected",
    [
        (T.BooleanType(), {}, "TINYINT(1)"),
        (T.LongType(), {}, "BIGINT"),
        (T.DoubleType(), {}, "DOUBLE"),
        (T.DecimalType(20, 0), {}, "DECIMAL(20,0)"),
        (T.TimestampType(), {}, "DATETIME"),
        (T.StringType(), {}, "VARCHAR(255)"),
        (T.StringType(), {"length": 100_000}, "MEDIUMTEXT"),
        (T.StringType(), {"length": 20_000_000}, "LONGTEXT"),
        (T.BinaryType(), {"length": 100_000}, "MEDIUMBLOB"),
    ],
)
def test_spark_to_mysql(dt, kwargs, expected):
    assert spark_to_mysql(dt, **kwargs) == expected


def test_roundtrip_core_types():
    for mysql in ["bigint", "double", "date", "datetime", "varchar"]:
        spark_t = mysql_to_spark(mysql)
        back = spark_to_mysql(spark_t)
        assert back.lower().startswith(mysql[:4])


def test_default_pk_first_column():
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    assert default_pk(schema) == ["a"]
    assert default_pk(schema, ["b"]) == ["b"]
    with pytest.raises(ValueError):
        default_pk(schema, ["zzz"])


def test_create_table_ddl():
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), nullable=False),
            T.StructField("name", T.StringType()),
            T.StructField("bal", T.DecimalType(12, 2)),
        ]
    )
    ddl = create_table_ddl("mv_target", schema, ["id"])
    assert "`id` BIGINT NOT NULL" in ddl
    assert "`bal` DECIMAL(12,2)" in ddl
    assert "PRIMARY KEY (`id`)" in ddl
