"""Tests of the TESTER: the driver-sim compare() must actually catch
each failure class it claims to (value drift, int-vs-float kind drift,
row/column mismatches) — a gate that can't fail is no gate. Plus
structural invariants of operators whose oracles could be satisfied by
degenerate output."""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))
from driver_sim import compare  # noqa: E402


def test_compare_catches_value_drift():
    a = pd.DataFrame({"k": [1, 2], "v": ["x", "y"]})
    b = pd.DataFrame({"k": [1, 2], "v": ["x", "z"]})
    assert compare(a, b)


def test_compare_catches_int_float_kind_drift():
    """The r1 HUGEINT failure mode: 3 == 3.0 but the driver's value hash
    distinguishes int from float — compare() must too."""
    a = pd.DataFrame({"n": pd.Series([3], dtype="int64")})
    b = pd.DataFrame({"n": pd.Series([3.0], dtype="float64")})
    assert compare(a, b)


def test_compare_catches_row_and_column_drift():
    a = pd.DataFrame({"k": [1, 2]})
    assert compare(a, pd.DataFrame({"k": [1]}))
    assert compare(a, pd.DataFrame({"j": [1, 2]}))


def test_compare_is_row_order_insensitive():
    a = pd.DataFrame({"k": [1, 2], "v": ["x", "y"]})
    b = pd.DataFrame({"k": [2, 1], "v": ["y", "x"]})
    assert compare(a, b) == []


def test_epoch_shuffle_is_a_permutation(spark, sf_dir):
    """Every doc appears exactly once; within each shard, positions are
    exactly 0..n_shard-1; the assignment is reproducible."""
    from ocr_suite_spark.queries.sampling import epoch_shuffle

    rows = epoch_shuffle(spark, sf_dir).collect()
    assert len({r["doc_id"] for r in rows}) == len(rows) == 500
    by_shard: dict[str, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), shard
    again = {(r["doc_id"], r["shard"], r["pos"]) for r in epoch_shuffle(spark, sf_dir).collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}


def test_every_oracle_sql_parses():
    """EXPLAIN every registered oracle in DuckDB — a syntax error in an
    oracle should fail in milliseconds here, not at driver-grading time."""
    from driver_sim import duck_con

    from ocr_suite_spark.queries import REGISTRY

    con = duck_con("/root/testdata/sf0.001")
    for name, (_, sql) in REGISTRY.items():
        con.execute(f"EXPLAIN {sql}")
