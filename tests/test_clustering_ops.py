"""Semantic test for kmeans_2iter: row-exact equality with an independent
pure-Python integer Lloyd's implementation (third engine beside Spark and
DuckDB) plus population invariants."""

from __future__ import annotations

import math

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def km_rows(spark):
    from ocr_suite_spark.queries.clustering import kmeans_2iter

    return {r["vec_id"]: r for r in kmeans_2iter(spark, SF).collect()}


@pytest.fixture(scope="module")
def quantized(spark):
    from ocr_suite_spark.queries.clustering import Q_SCALE

    pdf = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).toPandas()
    return {
        int(r["vec_id"]): [int(math.floor(float(x) * Q_SCALE)) for x in r["embedding"]]
        for _, r in pdf.iterrows()
    }


def _python_kmeans(q):
    from ocr_suite_spark.queries.clustering import KM_ITERS, KM_K

    cents = {cid: list(q[cid]) for cid in range(KM_K)}

    def assign():
        out = {}
        for vid, v in q.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(v, c)), cid)
                for cid, c in cents.items()
            )
            out[vid] = best  # (dist, cid) — min tie-breaks on cid
        return out

    for _ in range(KM_ITERS):
        a = assign()
        by_c: dict[int, list[int]] = {}
        for vid, (_, cid) in a.items():
            by_c.setdefault(cid, []).append(vid)
        new = {}
        for cid in cents:
            members = by_c.get(cid)
            if not members:
                new[cid] = cents[cid]  # emptied cluster keeps its centroid
                continue
            dim = len(q[members[0]])
            new[cid] = [
                math.floor(sum(q[m][i] for m in members) / len(members))
                for i in range(dim)
            ]
        cents = new
    return assign()


def test_kmeans_matches_python_oracle_exactly(km_rows, quantized):
    expect = _python_kmeans(quantized)
    assert set(km_rows) == set(quantized)
    for vid, (dist, cid) in expect.items():
        row = km_rows[vid]
        assert (row["cluster"], row["dist"]) == (cid, dist), vid


def test_kmeans_population_invariants(km_rows):
    from ocr_suite_spark.queries.clustering import KM_K

    clusters = {r["cluster"] for r in km_rows.values()}
    assert clusters <= set(range(KM_K))
    # non-degenerate: most clusters populated, no cluster owns everything
    assert len(clusters) >= KM_K - 2
    sizes = {}
    for r in km_rows.values():
        sizes[r["cluster"]] = sizes.get(r["cluster"], 0) + 1
    assert max(sizes.values()) < len(km_rows)
    assert all(r["dist"] >= 0 for r in km_rows.values())
