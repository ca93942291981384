import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[8]")
        .appName("tesseract_spark_tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(tmp_path_factory):
    """t1 smoke corpus (FIXTURES.md §6): ~40 docs, deterministic."""
    from tesseract_spark.fixtures import build_corpus

    out = tmp_path_factory.mktemp("corpus_t1")
    return build_corpus(str(out), n_docs=40)
