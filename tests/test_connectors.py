"""Connector registry + multimodal plumbing + pandas-UDF batteries."""

import pytest
from pyspark.sql import functions as F

from tiflink_spark.changelog import OP_COL, OP_INSERT, SEQ_COL
from tiflink_spark.connectors import ConnectorOptions, get_connector


def test_parquet_roundtrip_with_range_partitioning(spark, tmp_path):
    conn = get_connector("parquet")
    opts = ConnectorOptions(path=str(tmp_path / "t"), pk=["k"], range_partitions=4)
    df = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "k int, v string")
    conn.write(df, opts)
    back = conn.read(spark, opts)
    assert back.count() == 100
    assert back.rdd.getNumPartitions() == 4  # range partitioning applied


def test_changelog_connector_enforces_contract(spark, tmp_path):
    conn = get_connector("changelog")
    opts = ConnectorOptions(path=str(tmp_path / "c"))
    plain = spark.createDataFrame([(1, "a")], "k int, v string")
    plain.write.parquet(opts.path)
    with pytest.raises(ValueError, match="__op"):
        conn.read(spark, opts)

    opts2 = ConnectorOptions(path=str(tmp_path / "c2"))
    tagged = plain.withColumn(OP_COL, F.lit(OP_INSERT)).withColumn(SEQ_COL, F.lit(0))
    tagged.write.parquet(opts2.path)
    assert conn.read(spark, opts2).count() == 1


def test_keyed_store_connector(spark, tmp_path):
    conn = get_connector("keyed")
    opts = ConnectorOptions(path=str(tmp_path / "ks"), pk=["k"], num_buckets=4)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    conn.write(df, opts)
    assert {(r.k, r.v) for r in conn.read(spark, opts).collect()} == {(1, "a"), (2, "b")}


def test_unknown_connector():
    with pytest.raises(KeyError, match="unknown connector"):
        get_connector("nope")


@pytest.mark.slow
def test_multimodal_decode_plumbing(spark):
    from tiflink_spark.multimodal import decode_media, frame_sample_plan

    media = spark.createDataFrame(
        [(1, "image", bytearray(b"x" * 100)), (2, "image", bytearray(b"y" * 700))],
        "id long, kind string, data binary",
    )
    out = decode_media(media).collect()
    assert len(out) == 2
    by_id = {r.id: r for r in out}
    assert by_id[1].width == 64 + 100 % 577
    assert by_id[2].height == 64 + 700 % 421
    assert len(by_id[1].checksum) == 32

    frames = frame_sample_plan(media, every_n=30)
    got = frames.groupBy("id").count().collect()
    assert {r.id for r in got} == {1, 2}


def test_real_decoder_is_stubbed():
    from tiflink_spark.multimodal import decode_image

    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"not-an-image")


def test_pandas_udf_batteries(spark):
    from tiflink_spark.functions import cosine_sim, normalize_text, token_count

    df = spark.createDataFrame(
        [(1, "  Hello   WORLD! ",), (2, "a b c",)], "id int, text string"
    )
    got = df.select(
        "id", token_count("text").alias("n"), normalize_text("text").alias("t")
    ).collect()
    by_id = {r.id: r for r in got}
    assert by_id[1].t == "hello world!"
    assert by_id[2].n == 3

    vdf = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])],
        "a array<double>, b array<double>",
    )
    sims = [r.s for r in vdf.select(cosine_sim("a", "b").alias("s")).collect()]
    assert sims == [1.0, 0.0]


def test_csv_and_json_connectors_roundtrip(spark, tmp_path):
    from tiflink_spark.connectors import ConnectorOptions, get_connector

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "id int, name string"
    )
    for fmt in ("csv", "json"):
        path = str(tmp_path / fmt)
        conn = get_connector(fmt)
        conn.write(df, ConnectorOptions(path=path))
        back = conn.read(spark, ConnectorOptions(path=path, extra={"schema": df.schema}))
        assert back.schema == df.schema
        assert sorted((r.id, r.name) for r in back.collect()) == [
            (1, "alpha"), (2, "beta"), (3, "gamma"),
        ]


def test_csv_connector_stream_read(spark, tmp_path):
    from tiflink_spark.connectors import ConnectorOptions, get_connector

    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, v string")
    path = str(tmp_path / "csv_stream")
    conn = get_connector("csv")
    conn.write(df, ConnectorOptions(path=path))
    stream = conn.read_stream(
        spark, ConnectorOptions(path=path, extra={"schema": df.schema})
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("csv_stream_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("csv_stream_sink").count() == 2


def _derby_url(spark, tmp_path):
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(tmp_path))
    return f"jdbc:derby:{tmp_path}/db;create=true"


def test_jdbc_roundtrip_and_pk_reflection(spark, tmp_path):
    from tiflink_spark.catalog import Catalog
    from tiflink_spark.connectors import (
        ConnectorOptions,
        get_connector,
        jdbc_execute,
        jdbc_primary_key,
    )

    url = _derby_url(spark, tmp_path)
    jdbc_execute(
        spark,
        url,
        "CREATE TABLE t1 (id INTEGER NOT NULL PRIMARY KEY, v VARCHAR(32), n INTEGER)",
    )
    # NULL rides in the INTEGER column: Spark's Derby dialect binds null
    # strings as CLOB, which Derby VARCHAR rejects (dialect limitation).
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None)], "id int, v string, n int"
    )
    get_connector("jdbc").write(df, ConnectorOptions(path=url, extra={"table": "t1"}))

    assert [c.lower() for c in jdbc_primary_key(spark, url, "t1")] == ["id"]

    cat = Catalog(spark)
    spec = cat.register_jdbc("t1_view", url, table="t1")
    assert [c.lower() for c in spec.pk] == ["id"]
    back = get_connector("jdbc").read(
        spark, ConnectorOptions(path=url, extra={"table": "t1"})
    )
    rows = {r[0]: (r[1], r[2]) for r in back.collect()}
    assert rows == {1: ("a", 10), 2: ("b", None)}


def test_jdbc_composite_pk_reflected_in_key_seq_order(spark, tmp_path):
    from tiflink_spark.connectors import jdbc_execute, jdbc_primary_key

    url = _derby_url(spark, tmp_path)
    jdbc_execute(
        spark,
        url,
        "CREATE TABLE t2 (b INTEGER NOT NULL, a INTEGER NOT NULL, v VARCHAR(8), "
        "PRIMARY KEY (b, a))",
    )
    # KEY_SEQ order (declaration order), not alphabetical
    assert [c.lower() for c in jdbc_primary_key(spark, url, "t2")] == ["b", "a"]


def test_jdbc_pk_reflection_no_pk_falls_back_to_first_column(spark, tmp_path):
    from tiflink_spark.catalog import Catalog
    from tiflink_spark.connectors import ConnectorOptions, get_connector, jdbc_execute

    url = _derby_url(spark, tmp_path)
    jdbc_execute(spark, url, "CREATE TABLE t3 (x INTEGER, y VARCHAR(8))")
    df = spark.createDataFrame([(1, "a")], "x int, y string")
    get_connector("jdbc").write(df, ConnectorOptions(path=url, extra={"table": "t3"}))
    spec = Catalog(spark).register_jdbc("t3_view", url, table="t3")
    # No PK in the database -> default_pk rule (first column,
    # TiFlinkApp.java:276-281)
    assert [c.lower() for c in spec.pk] == ["x"]


def test_mvapp_ddl_hook_executes_generated_ddl(spark, tmp_path):
    from tiflink_spark.app import MVApp
    from tiflink_spark.connectors import jdbc_execute

    url = _derby_url(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 7.0)], "k int, v double"
    )
    seen = []

    def hook(ddl):
        seen.append(ddl)
        # The generated CREATE TABLE must be executable on a real
        # database (TiJDBCHelper.java:111-140 analog). The template is
        # MySQL-dialect like the reference's (its target IS TiDB);
        # adapting to an ANSI target (Derby: no IF NOT EXISTS, no
        # backticks) is the hook's job.
        jdbc_execute(
            spark, url, ddl.replace("IF NOT EXISTS ", "").replace("`", "")
        )

    app = (
        MVApp.builder(spark)
        .source("hook_src", src, pk=["k"])
        .query("SELECT k, count(*) AS n FROM hook_src GROUP BY k")
        .target(str(tmp_path / "mv"))
        .ddl_hook(hook)
        .build()
    )
    app.bootstrap()
    assert len(seen) == 1 and "CREATE TABLE" in seen[0]
    # the DDL-created table exists and is queryable over JDBC
    cnt = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "mv")
        .load()
        .count()
    )
    assert cnt == 0


def test_rate_changelog_batch_dual_final_state(spark, tmp_path):
    """The connector's batch dual applied through the keyed store must
    land on the script's closed-form final state — the same state the
    streamed run converges to (streaming_rate_changelog gate)."""
    from tiflink_spark.connectors import ConnectorOptions, get_connector
    from tiflink_spark.store import KeyedParquetStore

    total, keys = 300, 50
    changes = get_connector("rate-changelog").read(
        spark, ConnectorOptions(path="", extra={"total": total, "num_keys": keys})
    )
    store = KeyedParquetStore(spark, str(tmp_path / "s"), ["key"], 2)
    store.bootstrap(spark.createDataFrame([], "key long, amount double"), batch_id=0)
    store.merge(changes, batch_id=1)
    got = {r["key"]: r["amount"] for r in store.read().collect()}
    want = {k: float(k + 250) for k in range(keys) if k % 3 != 0}
    assert got == want


def test_rate_changelog_stream_is_streaming(spark):
    from tiflink_spark.connectors import ConnectorOptions, get_connector

    df = get_connector("rate-changelog").read_stream(
        spark, ConnectorOptions(path="", extra={"total": 300, "num_keys": 50})
    )
    assert df.isStreaming
    assert set(df.columns) == {"key", "amount", "__op", "__seq"}
