import pytest


@pytest.fixture(scope="session")
def spark():
    from crawlspark.session import get_spark

    s = get_spark(cores=4, shuffle_partitions=8, app="crawlspark-tests",
                  driver_mem="8g")
    yield s
    s.stop()
