import pytest

from door2door_etl_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    spark = build_session(
        app_name="door2door-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_confs={"spark.driver.memory": "4g"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
