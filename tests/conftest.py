import pytest


@pytest.fixture(scope="session")
def spark():
    from marky_spark.session import get_spark

    s = get_spark(app="marky-spark-tests", master="local[4]",
                  confs={"spark.sql.shuffle.partitions": "8",
                         "spark.ui.enabled": "false"})
    yield s
    s.stop()
