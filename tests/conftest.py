"""Shared pytest fixtures: one SparkSession per test run, small fixture data.

Correctness tiers per SURVEY.md §5.2: unit tests on tiny hand-written
frames, oracle comparison on generated pages, resume/idempotence on a
dedicated temp dir.
"""

from __future__ import annotations

import pytest

from vectrain_spark.fixtures import gen_pages
from vectrain_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="vectrain_spark_tests", cores=8, shuffle_partitions=16)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_fixture():
    """(pages, truth, aliases) pandas frames — 400 deterministic pages."""
    return gen_pages(400)


@pytest.fixture(scope="session")
def pages_df(spark, small_fixture):
    pages, _, _ = small_fixture
    return spark.createDataFrame(pages[["url", "warc_ts", "html", "lang"]]).cache()


@pytest.fixture(scope="session")
def aliases_df(spark, small_fixture):
    _, _, aliases = small_fixture
    return spark.createDataFrame(aliases[["entity_id", "alias"]]).cache()


@pytest.fixture(scope="session")
def golden(small_fixture):
    """Oracle pipeline outputs for the small fixture."""
    from vectrain_spark.oracle import oracle_pipeline

    pages, _, aliases = small_fixture
    return oracle_pipeline(pages, aliases)
