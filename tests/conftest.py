import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from data_juicer_spark import get_spark

    s = get_spark(parallelism=8, shuffle_partitions=8, app_name="tests")
    yield s


@pytest.fixture()
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
