from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from ocr_suite_spark.session import get_spark

    s = get_spark(cores=8, app="ocr-suite-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
