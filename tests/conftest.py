import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="session")
def spark():
    from delver_spark.session import get_spark

    s = get_spark("delver_spark_tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def unit_corpus(tmp_path_factory):
    """Small corpus for spark-vs-oracle equivalence (bounded rounds)."""
    from delver_spark.fixtures.gen import generate_corpus

    d = str(tmp_path_factory.mktemp("corpus_unit"))
    generate_corpus(d, n_pages=200, n_hosts=12, seed=7, max_rounds=8)
    return d
