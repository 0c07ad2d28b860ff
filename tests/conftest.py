import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cs3103_gocrawler_spark.session import build_session  # noqa: E402
from cs3103_gocrawler_spark.synthetic.webgen import WebConfig, write_parquet_tables  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(master="local[4]", shuffle_partitions=4,
                      extra_conf={"spark.driver.memory": "4g"})
    yield s
    s.stop()


TINY = WebConfig(seed=42, n_hosts=4, n_pages=60, max_degree=5)
MEDIUM = WebConfig(seed=7, n_hosts=12, n_pages=400, max_degree=6)


@pytest.fixture(scope="session")
def tiny_web(tmp_path_factory):
    d = tmp_path_factory.mktemp("tinyweb")
    write_parquet_tables(TINY, str(d))
    return TINY, str(d)


@pytest.fixture(scope="session")
def medium_web(tmp_path_factory):
    d = tmp_path_factory.mktemp("medweb")
    write_parquet_tables(MEDIUM, str(d))
    return MEDIUM, str(d)
