import os

import pytest


@pytest.fixture(scope="session")
def spark():
    # Executor workers unpickle test-module functions (e.g. mock
    # transports) by reference — the tests dir must be importable there.
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    existing = os.environ.get("PYTHONPATH", "")
    if tests_dir not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{tests_dir}{os.pathsep}{existing}" if existing else tests_dir

    from datagrowth_spark.core.session import get_spark

    spark = get_spark(app_name="datagrowth-spark-tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()
