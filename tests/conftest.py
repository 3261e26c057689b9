import pytest


@pytest.fixture(scope="session")
def spark():
    from dawis_spark.session import get_spark

    s = get_spark("dawis-tests", master="local[4]", shuffle_partitions=4)
    yield s
