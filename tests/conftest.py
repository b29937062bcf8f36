import pytest


@pytest.fixture(scope="session")
def spark():
    from hastl_spark.session import get_spark

    s = get_spark(cpus=8, shuffle_partitions=8, app_name="hastl-tests")
    yield s
    s.stop()
