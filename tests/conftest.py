import pytest

from datagrowth_spark.core.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="datagrowth-spark-tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()
