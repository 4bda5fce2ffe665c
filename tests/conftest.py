import pytest

from flink_210225_spark import get_spark


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "broker: needs a live Kafka broker (SPARK_GRAFT_KAFKA_BOOTSTRAP); "
        "skips otherwise — see tests/test_kafka_broker.py",
    )

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="flink_210225_spark_tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from flink_210225_spark.io import load_tables

    return load_tables(spark, SF_DIR)


@pytest.fixture(scope="session")
def tables_med(spark):
    from flink_210225_spark.io import load_tables

    return load_tables(spark, SF_DIR_MED)
