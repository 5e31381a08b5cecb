from gtfsrt2lc_spark.fixtures.pages import (  # noqa: F401
    PREDICATES,
    build_corpus,
    corpus_dataframes,
)
