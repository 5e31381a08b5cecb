from __future__ import annotations

import pytest

from gtfsrt2lc_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="gtfsrt2lc_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def corpus():
    from gtfsrt2lc_spark.fixtures.pages import build_corpus

    return build_corpus(n_pages=200, seed=42)


@pytest.fixture(scope="session")
def corpus_dfs(spark, corpus):
    from gtfsrt2lc_spark.fixtures.pages import corpus_dataframes

    return corpus_dataframes(spark, corpus)
