"""Registry-wide physical-plan lint: every registered query's executed
plan is scanned for scale anti-patterns. Any future query that introduces
row-at-a-time Python, a cartesian product, or an unjustified
single-partition exchange fails here with its plan — the automated form
of PLANS.md's audit."""

from __future__ import annotations

import pytest

from ocr_suite_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

# Queries allowed to contain an Exchange SinglePartition — each one's
# single partition carries a PROVABLY bounded relation, never the corpus:
SINGLE_PARTITION_OK = {
    "sample_mixture": "1-row lambda aggregate (min over per-source rates)",
    "a8_progress_pct": "single-row global progress percentage",
    "j1_dict_like_join": "dense_rank over the distinct vocabulary — kept for "
    "the reference's dense 1..V ids; j2_hash_id_mint is the shipped path",
    "o1_size_ranked_assign": "global rank over per-source totals (n_sources rows)",
    "q6_forecast_revenue": "single-row TPC-H aggregate",
    "nchars_quantiles": "per-lang exact percentiles (n_lang rows)",
    "w1_global_sort": "100-row exchange above TakeOrderedAndProject",
    "bm25_search": "20-row exchange above TakeOrderedAndProject (w1 pattern)",
    "knn_self_join": "1-row global COUNT aggregate (occupancy bit-width, blocking.py)",
    "dedup_embedding_cosine": "1-row global COUNT aggregate (occupancy bit-width)",
    "curate_funnel_stages": "per-stage 1-row COUNT aggregates (the funnel's "
    "job summary; stage relations are checkpointed, never corpus-wide here)",
    "bpe_pair_counts": "50-row exchange above TakeOrderedAndProject (w1 pattern)",
    "dedup_semdedup": "1-row stats aggregate (occupancy-rule sem_bits/step, "
    "blocking.py pattern; the corpus-wide stages are checkpointed upstream)",
    "dsir_importance": "1-row totals aggregate over the <= DSIR_BUCKETS-row "
    "(1024) bucket-count relation — model-sized, never corpus-sized",
}

# Queries allowed a BroadcastNestedLoopJoin — all with a tiny pinned build
# side (plan-tested separately in test_sources.py):
BNLJ_OK = {
    "sample_mixture": "1-row lambda broadcast crossed with per-source counts",
    "ann_topk_bruteforce": "BuildLeft: the 8-query set broadcast over the corpus",
    "ann_ivf_topk": "BuildLeft: 16 centroid rows broadcast for cell assignment",
    "ann_ivf_multiprobe": "BuildLeft: the same 16-centroid broadcast assignment",
    "kmeans_2iter": "K=8 centroid rows broadcast per assignment pass (IVF pattern)",
    "dedup_semdedup": "1-row stats broadcast + adaptive centroid broadcasts "
    "(bucket-miss fallback only; the main assignment is a bk equi-join)",
    "knn_self_join": "1-row corpus-count broadcast (occupancy bit-width, blocking.py)",
    "dedup_embedding_cosine": "1-row corpus-count broadcast (occupancy bit-width)",
    "dsir_importance": "1-row gram-totals broadcast crossed with the "
    "<= DSIR_BUCKETS-row (1024) bucket-count relation (sample_mixture pattern)",
}


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, (fn, _) in REGISTRY.items():
        out[name] = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_row_python_anywhere(plans):
    """Row-at-a-time Python UDFs are banned everywhere — Arrow-batched
    mapInPandas is the only Python entry point."""
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert bad == [], bad


def test_no_cartesian_products(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert bad == [], bad


def test_single_partition_exchanges_are_bounded(plans):
    bad = [
        n
        for n, p in plans.items()
        if "Exchange SinglePartition" in p and n not in SINGLE_PARTITION_OK
    ]
    assert bad == [], (
        f"unjustified single-partition exchange in {bad}; if the relation is "
        "provably bounded, add it to SINGLE_PARTITION_OK with the reason"
    )


def test_nested_loop_joins_are_bounded(plans):
    bad = [
        n for n, p in plans.items() if "BroadcastNestedLoopJoin" in p and n not in BNLJ_OK
    ]
    assert bad == [], (
        f"unjustified nested-loop join in {bad}; if the build side is "
        "provably tiny, add it to BNLJ_OK with the reason"
    )
