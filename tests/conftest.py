import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawl4ai_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="crawl4ai_spark_tests", master="local[4]", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def site():
    from crawl4ai_spark.synth.pages import generate_site

    return generate_site(n_hosts=3, cats=3, subs=2, prods=5)


@pytest.fixture(scope="session")
def site_dir(site, tmp_path_factory):
    from crawl4ai_spark.synth.pages import write_site_parquet

    d = tmp_path_factory.mktemp("site")
    write_site_parquet(site, str(d))
    return str(d)
