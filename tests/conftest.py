import pytest

from quackio_jl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="quackio_tests", cpus=8, driver_memory="8g")
    yield s


@pytest.fixture()
def basic_df(spark):
    """F1 fixture — the reference's canonical 3-column table
    (/root/reference/test/runtests.jl:10): a=[1,2], b=["x","yz"], c=[1.0, missing]."""
    return spark.createDataFrame(
        [(1, "x", 1.0), (2, "yz", None)], schema="a long, b string, c double"
    )
