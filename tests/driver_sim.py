"""Local simulation of the driver's correctness gate.

For each entry in __spark_entry__.queries() that has an oracle_sql(),
run the Spark DataFrame and the DuckDB SQL on the same parquet tables and
compare row count, (sorted) column names, and an order-insensitive value
comparison. Usable as a pytest helper and as a CLI:

    python tests/driver_sim.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical row order for order-insensitive compare
    key = df.astype(str).apply(lambda r: "\x00".join(r.values), axis=1) if len(df) else None
    if key is not None:
        df = df.iloc[key.argsort(kind="stable")].reset_index(drop=True)
    return df


def _num_kind(v) -> str:
    """'i' / 'f' / 'o': the distinction the driver's value hash is sensitive
    to. DuckDB SUM(BIGINT) returns HUGEINT which pandas renders as float64,
    so spark int64 3 vs duck float64 3.0 hash-differ even though `==` says
    equal — the r1 j3/w2/o1 failure mode. Int widths are NOT distinguished
    (the driver tolerated int32 vs int64 in r1's w1)."""
    import numpy as np

    if isinstance(v, (bool, np.bool_)):
        return "o"
    if isinstance(v, (int, np.integer)):
        return "i"
    if isinstance(v, (float, np.floating)):
        return "f"
    return "o"


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Returns a list of problems; empty == match."""
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns: spark={s_cols} duck={d_cols}")
        return problems
    if problems:
        return problems
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        for i, (x, y) in enumerate(zip(av, bv)):
            same = (
                (x is None and y is None)
                or (isinstance(x, float) and isinstance(y, float) and math.isnan(x) and math.isnan(y))
                or (x == y and _num_kind(x) == _num_kind(y))
            )
            if not same:
                problems.append(f"col {c} row {i}: spark={x!r} ({type(x).__name__}) duck={y!r} ({type(y).__name__})")
                if len(problems) > 6:
                    return problems
    return problems


def run_gate(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, list[str]]:
    import __spark_entry__ as E

    qs, sqls = E.queries(), E.oracle_sql()
    con = duck_con(sf_dir)
    results: dict[str, list[str]] = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        if name not in sqls:
            results[name] = ["(rows-only: no oracle)"] if fn(get_spark_lazy(), sf_dir).count() >= 0 else ["no rows"]
            continue
        spark_pdf = fn(spark, sf_dir).toPandas()
        duck_pdf = con.execute(sqls[name]).df()
        results[name] = compare(spark_pdf, duck_pdf)
    return results


_spark = None


def get_spark_lazy():
    global _spark
    if _spark is None:
        from ocr_suite_spark.session import get_spark

        _spark = get_spark(cores=8, shuffle_partitions=8, app="driver-sim")
    return _spark


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None
    res = run_gate(get_spark_lazy(), sf_dir, names)
    bad = 0
    for name, problems in sorted(res.items()):
        if problems and problems != ["(rows-only: no oracle)"]:
            bad += 1
            print(f"FAIL {name}")
            for p in problems:
                print(f"   {p}")
        else:
            tag = "rows-only" if problems else "ok"
            print(f"PASS {name} ({tag})")
    sys.exit(1 if bad else 0)
