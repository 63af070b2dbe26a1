import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("ZSOLR_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from zsolr.session import get_spark

    s = get_spark("zsolr-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def corpus_df(spark, sf_dir):
    from zsolr.corpus import synth_corpus

    return synth_corpus(spark, sf_dir)


@pytest.fixture(scope="session")
def built_index(tmp_path_factory, spark, corpus_df, sf_dir):
    """One shared index build over the sf0.001 corpus for all search tests."""
    from zsolr.build import BuildConfig, IndexBuilder
    from zsolr.catalog import ManifestParquetCatalog

    root = str(tmp_path_factory.mktemp("index"))
    cat = ManifestParquetCatalog(root)
    cfg = BuildConfig(n_buckets=8, hot_df_threshold=200)  # force salting path
    builder = IndexBuilder(cat, cfg)
    result = builder.build(spark, f"{sf_dir}/corpus", corpus_df=corpus_df)
    return cat, result
