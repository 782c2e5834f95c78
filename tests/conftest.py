from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from ocr_suite_spark.session import get_spark

    s = get_spark(
        cores=8,
        app="ocr-suite-spark-tests",
        shuffle_partitions=8,
        # managed-table warehouse for the bucketing tests, out of the repo dir
        extra={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="ocs-wh-")},
    )
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
