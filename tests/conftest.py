import pytest


@pytest.fixture(scope="session")
def spark():
    from cl_readability_spark.pipeline.session import build_spark

    s = build_spark(app_name="cl-readability-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()
