"""Run the driver-gate simulation over every oracle-backed query at
sf0.001 (the full set runs in driver_sim CLI / the real driver at sf0.01)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent))
from driver_sim import compare, duck_con  # noqa: E402

from ocr_suite_spark.queries import REGISTRY  # noqa: E402

SF = "/root/testdata/sf0.001"

ORACLE_QUERIES = sorted(name for name, (_, sql) in REGISTRY.items() if sql)


@pytest.fixture(scope="module")
def duck():
    return duck_con(SF)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    fn, sql = REGISTRY[name]
    problems = compare(fn(spark, SF).toPandas(), duck.execute(sql).df())
    assert not problems, problems


def test_rows_only_queries_return_rows(spark):
    for name, (fn, sql) in REGISTRY.items():
        if sql is None and not name.startswith("extract"):
            assert fn(spark, SF).count() >= 0, name
