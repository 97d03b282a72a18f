"""Catalog: PK-carrying registry over the testdata tables."""

from tiflink_spark.session import TABLE_PKS, load_catalog

SF_DIR = "/root/testdata/sf0.001"


def test_load_catalog_carries_pks(spark):
    cat = load_catalog(spark, SF_DIR)
    assert set(cat.list_tables()) == set(TABLE_PKS)
    assert cat.get("lineitem").pk == []  # synthetic lineitem is keyless
    assert cat.get("customer").pk == ["c_custkey"]
    # tables are queryable by name after registration
    assert spark.sql("SELECT count(*) AS n FROM nation").collect()[0].n == 25


def test_catalog_pks_are_actually_unique(spark):
    """The declared PK must really be a key — the invariant every MV
    store MERGE depends on."""
    cat = load_catalog(spark, SF_DIR)
    for name, pk in TABLE_PKS.items():
        if not pk:  # declared keyless
            continue
        df = spark.table(name)
        total = df.count()
        distinct = df.select(*pk).distinct().count()
        assert total == distinct, f"{name}: pk {pk} not unique ({distinct}/{total})"
