import shutil

import pytest

from whoiswho_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="whoiswho_spark_tests", master="local[8]", shuffle_partitions=8
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(spark):
    """Deterministic 150-entity corpus, cached for the whole test session."""
    from whoiswho_spark.sources.pages import generate_pages

    df = generate_pages(spark, 150).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("er_work")
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)
