import pytest


@pytest.fixture(scope="session")
def spark():
    from tiflink_spark.session import get_spark

    # Small shuffle fan-out keeps the many tiny test jobs fast.
    s = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "4"})
    yield s
    s.stop()
