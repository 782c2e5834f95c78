"""Recall@k of the approximate ANN variants against the brute-force
ground truth — the quality metric an ANN index is judged by, and the
monotonicity that justifies the multi-probe knob (probing more cells can
only add candidates, so recall is non-decreasing in nprobe)."""

from __future__ import annotations

import pytest

from ocr_suite_spark.queries.similarity import (
    TOP_K,
    ann_ivf_multiprobe,
    ann_ivf_topk,
    ann_lsh_topk,
    ann_topk_bruteforce,
)

SF = "/root/testdata/sf0.01"


def _neighbors(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(approx: dict[int, set[int]], truth: dict[int, set[int]]) -> float:
    hits = sum(len(approx.get(q, set()) & t) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    return hits / total


@pytest.fixture(scope="module")
def truth(spark):
    return _neighbors(ann_topk_bruteforce(spark, SF))


def test_multiprobe_recall_dominates_single_probe(spark, truth):
    r1 = _recall(_neighbors(ann_ivf_topk(spark, SF)), truth)
    r2 = _recall(_neighbors(ann_ivf_multiprobe(spark, SF)), truth)
    # probing a superset of cells can only add candidates; any candidate
    # displacing another has strictly higher cosine, so overlap with the
    # true top-k is non-decreasing
    assert r2 >= r1, (r1, r2)
    assert r2 > 0.0


def test_all_variants_report_sane_recall(spark, truth):
    """Every approximate variant finds some of the true top-k and never
    reports more than k neighbors. Absolute recall is LOW on this corpus
    by construction (measured: ivf 0.10, multiprobe 0.15, lsh 0.025) —
    the synthetic embeddings are isotropic random vectors, the worst case
    for any space-partitioning index (no cluster structure for cells or
    sign-buckets to capture); real embedding corpora cluster, which is
    what these indexes exploit. The structural claims (candidate
    generation shape, probe monotonicity, exact scoring within cells) are
    what these tests pin down."""
    for fn in (ann_ivf_topk, ann_ivf_multiprobe, ann_lsh_topk):
        approx = _neighbors(fn(spark, SF))
        assert all(len(v) <= TOP_K for v in approx.values())
        assert _recall(approx, truth) > 0.0, fn.__name__
