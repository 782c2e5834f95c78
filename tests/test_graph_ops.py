"""Semantic tests for the link-graph operators: pagerank_2iter checked
row-exactly against an independent pure-Python fixed-point PageRank (a
third engine besides Spark and DuckDB), plus conservation invariants.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pr_rows(spark):
    from ocr_suite_spark.queries.graph import pagerank_2iter

    return {r["doc_id"]: r for r in pagerank_2iter(spark, SF).collect()}


@pytest.fixture(scope="module")
def doc_ids(spark):
    return [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]


def _python_pagerank(ids):
    from ocr_suite_spark.queries.graph import _D_DEN, _D_NUM, _ITERS, _MAPS, K

    n = len(ids)

    def tgt(u, p1, p2, a, b):
        return ((u % p1) * (u % p2) + a * u + b) % n

    edges: list[tuple[int, int]] = []
    for u in ids:
        targets = {tgt(u, *_MAPS[0]), tgt(u, *_MAPS[1])}
        if u % 2 == 0:
            targets.add(tgt(u, *_MAPS[2]))
        edges.extend((u, v) for v in targets)
    deg: dict[int, int] = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    base = (15 * K) // (100 * n)
    rank = {u: K // n for u in ids}
    for _ in range(_ITERS):
        sums: dict[int, int] = {}
        for u, v in edges:
            sums[v] = sums.get(v, 0) + (_D_NUM * rank[u]) // (_D_DEN * deg[u])
        rank = {u: base + sums.get(u, 0) for u in ids}
    in_deg: dict[int, int] = {}
    for _, v in edges:
        in_deg[v] = in_deg.get(v, 0) + 1
    return rank, deg, in_deg


def test_pagerank_matches_python_oracle_exactly(pr_rows, doc_ids):
    """Fixed-point arithmetic means EXACT equality, not tolerance bands —
    the whole reason the op uses integer math."""
    rank, deg, in_deg = _python_pagerank(doc_ids)
    assert set(pr_rows) == set(doc_ids)
    for u in doc_ids:
        row = pr_rows[u]
        assert row["rank"] == rank[u], u
        assert row["out_deg"] == deg.get(u, 0), u
        assert row["in_deg"] == in_deg.get(u, 0), u


def test_outlink_extraction_recovers_the_graph(spark, doc_ids):
    """html_outlinks' regex extraction over the markup yields EXACTLY the
    edge list pagerank_2iter iterates over — extraction → PageRank composes
    with no adapter, which is the real-crawl pipeline shape."""
    from ocr_suite_spark.queries.graph import _edges, html_outlinks

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    synthesized = {
        (r["src"], r["dst"]) for r in _edges(docs, len(doc_ids)).collect()
    }
    rows = html_outlinks(spark, SF).collect()
    extracted = {(r["src"], r["dst"]) for r in rows}
    assert extracted == synthesized
    # the host anchor is extracted alongside and never collides with doc://
    assert all(r["host"].endswith(".example.com/") for r in rows)


def test_hits_matches_python_oracle_exactly(spark, doc_ids):
    """Unnormalized HITS is pure integer summation — exact equality with
    the Python replica, same rationale as the PageRank test."""
    from ocr_suite_spark.queries.graph import _ITERS, _MAPS, hits_2iter

    n = len(doc_ids)

    def tgt(u, p1, p2, a, b):
        return ((u % p1) * (u % p2) + a * u + b) % n

    edges = []
    for u in doc_ids:
        targets = {tgt(u, *_MAPS[0]), tgt(u, *_MAPS[1])}
        if u % 2 == 0:
            targets.add(tgt(u, *_MAPS[2]))
        edges.extend((u, v) for v in targets)
    h = {u: 1 for u in doc_ids}
    a = {}
    for _ in range(_ITERS):
        a = {u: 0 for u in doc_ids}
        for u, v in edges:
            a[v] += h[u]
        h = {u: 0 for u in doc_ids}
        for u, v in edges:
            h[u] += a[v]
    rows = {r["doc_id"]: r for r in hits_2iter(spark, SF).collect()}
    assert set(rows) == set(doc_ids)
    for u in doc_ids:
        assert (rows[u]["hub"], rows[u]["auth"]) == (h[u], a[u]), u
    # non-degenerate: scores vary and some sinks have hub 0
    assert len({r["hub"] for r in rows.values()}) > 10


def test_pagerank_conservation_invariants(pr_rows):
    from ocr_suite_spark.queries.graph import K

    n = len(pr_rows)
    total = sum(r["rank"] for r in pr_rows.values())
    # truncating division only ever loses mass: sum stays within (damping
    # teleport keeps >= 15% of K) and never exceeds K
    assert 0 < total <= K
    assert total >= (15 * K) // 100 - n  # base floor minus per-node truncation
    # every edge leaves one node and enters one node
    assert sum(r["out_deg"] for r in pr_rows.values()) == sum(
        r["in_deg"] for r in pr_rows.values()
    )
    # out-degree by construction is 2 or 3 (minus self-collisions >= 1)
    assert all(1 <= r["out_deg"] <= 3 for r in pr_rows.values())
    # ranks must actually vary (in-degree skew exists) or the test is vacuous
    assert len({r["rank"] for r in pr_rows.values()}) > 10
