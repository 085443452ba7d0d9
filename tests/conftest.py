import pytest

from frontier_engine.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("local[8]", app_name="frontier-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(spark):
    from frontier_engine import synth
    from frontier_engine.schema import PAGES

    return spark.createDataFrame(synth.gen_pages(300), schema=PAGES).cache()
