import pytest


@pytest.fixture(scope="session")
def spark():
    from dawis_spark.session import get_spark

    s = get_spark("dawis-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(autouse=True, scope="module")
def _cache_hygiene():
    """Drop persisted relations between test modules — the same
    discipline bench.py applies between queries. A persist() taken by
    one module's query (range_partitioned_ranks, minhash) otherwise
    stays in the session-scoped SparkSession's cache manager, where it
    can substitute into a LATER module's plan as InMemoryTableScan and
    flip a pinned plan shape (seen once as an order-dependent
    test_trend_slopes failure)."""
    yield
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is not None:
        s.catalog.clearCache()
