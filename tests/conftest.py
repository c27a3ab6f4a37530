import pytest

from searchengine_spark.corpus import synth_corpus
from searchengine_spark.oracle import build_oracle
from searchengine_spark.session import get_spark

N_DOCS = 300


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_rows():
    return synth_corpus(N_DOCS)


@pytest.fixture(scope="session")
def oracle(corpus_rows):
    return build_oracle(corpus_rows)


@pytest.fixture(scope="session")
def corpus_df(spark, corpus_rows):
    return spark.createDataFrame(corpus_rows)


@pytest.fixture(scope="session")
def tables(spark, corpus_df):
    from searchengine_spark.index import build_tables

    return build_tables(spark, corpus_df, compute_quality=True)


@pytest.fixture(scope="session")
def index_dir(spark, tables, tmp_path_factory):
    from searchengine_spark.index.shards import write_index

    d = str(tmp_path_factory.mktemp("index") / "idx")
    write_index(spark, tables, d)
    return d


@pytest.fixture(scope="session")
def spark_prop(spark):
    """Alias fixture for property tests (hypothesis can't take
    function-scoped fixtures; the session spark is fine)."""
    return spark
