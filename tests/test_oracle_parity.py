"""Run the driver-gate simulation over every oracle-backed query at
sf0.001 (the full set runs in driver_sim CLI / the real driver at sf0.01)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent))
from driver_sim import compare, duck_con  # noqa: E402

from ocr_suite_spark.queries import GOLDEN_QUERIES, REGISTRY  # noqa: E402
from ocr_suite_spark.queries.common import GOLDEN_SF_DIR  # noqa: E402

SF = "/root/testdata/sf0.001"

ORACLE_QUERIES = sorted(
    name for name, (_, sql) in REGISTRY.items() if sql and name not in GOLDEN_QUERIES
)


@pytest.fixture(scope="module")
def duck():
    return duck_con(SF)


@pytest.fixture(scope="module")
def duck_medium():
    return duck_con(GOLDEN_SF_DIR)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    fn, sql = REGISTRY[name]
    problems = compare(fn(spark, SF).toPandas(), duck.execute(sql).df())
    assert not problems, problems


@pytest.mark.parametrize("name", sorted(GOLDEN_QUERIES))
def test_golden_parity(spark, duck_medium, name):
    """Golden freshness: the Spark query at sf0.01 must still equal its
    committed fixture — catches kernel/datagen drift that would silently
    invalidate goldens (regenerate with tests/gen_goldens.py)."""
    fn, sql = REGISTRY[name]
    problems = compare(
        fn(spark, GOLDEN_SF_DIR).toPandas(), duck_medium.execute(sql).df()
    )
    assert not problems, problems


@pytest.mark.parametrize("name", sorted(GOLDEN_QUERIES))
def test_golden_parity_second_sf(spark, name):
    """Two-SF golden sanity (VERDICT r2 ask #9): the same golden pipeline
    verified against committed sf0.001 fixtures, so a driver SF change
    can't silently invalidate the sf0.01-pinned oracles without this
    tripping first."""
    import duckdb
    import os

    from ocr_suite_spark.queries.common import GOLDEN_DIR_SMALL, GOLDEN_SMALL_SF_DIR

    fixture = os.path.join(GOLDEN_DIR_SMALL, f"{name}.parquet")
    assert os.path.exists(fixture), f"missing {fixture}; run tests/gen_goldens.py"
    want = duckdb.connect().execute(f"SELECT * FROM read_parquet('{fixture}')").df()
    got = REGISTRY[name][0](spark, GOLDEN_SMALL_SF_DIR).toPandas()
    problems = compare(got, want)
    assert not problems, problems


def test_every_query_has_an_oracle():
    """r2 invariant: zero rows-only queries — everything registered is
    value-level gradeable (recomputing SQL or golden fixture)."""
    missing = [name for name, (_, sql) in REGISTRY.items() if sql is None]
    assert missing == [], missing


# Queries allowed to sit past the driver's 50-entry grading prefix: fully
# green in CORRECTNESS_r03.json (rows+schema+hash) and semantically frozen
# since the r3 verdict commit (8863fb4) — r03 is their standing proof
# (COVERAGE.md records per-query rounds). Anything NOT on this list must
# stay inside the prefix so it gets a driver row. The r2-frozen list that
# lived here through r3 is EMPTY as of r4: all 37 of its members were
# rotated back into the r4 grading prefix (VERDICT r3 ask #1).
R03_PROVEN_FROZEN = {
    "ann_ivf_multiprobe", "lm_unigram_score", "tfidf_top_terms",
    "bm25_search", "pagerank_2iter", "html_outlinks", "kmeans_2iter",
    "hits_2iter", "media_frame_sample", "sample_hash_fraction",
    "sample_stratified", "nchars_quantiles", "sample_mixture",
    "epoch_shuffle", "source_divergence", "quality_repetition",
    "pii_scrub", "chunk_windows", "quality_c4_rules",
    "quality_gopher_rules", "html_main_content", "pdf_layout_parse",
    "dom_text_density", "asof_join_prior_view", "sessionize_gap",
    "range_join_nearby", "rolling_range_1d", "dedup_exact",
    "dedup_url_canonical", "dedup_keep_canonical",
    "dedup_minhash_signature", "dedup_minhash_pairs", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_passages", "dedup_clusters",
    "j2_hash_id_mint", "o1_size_ranked_assign", "o1_lpt_assign",
}

# Residual r2-frozen queries: displaced from the r4 prefix by the late-r4
# operators (dedup_semdedup, bpe_pair_counts, corpus_stats_rollup,
# corpus_snapshot_diff, media_audio_meta). Trivial scalar/normalizer projections, bodies
# untouched since the r2 verdict commit — CORRECTNESS_r02 remains their
# proof (VERDICT r3 accepted a residual list of <= 12).
R02_PROVEN_FROZEN = {
    "p8_confidence_scale", "p9_frame_time", "p12_date_format", "p23_normalize",
    "p6_word_split_pos",
}


def test_grading_prefix_covers_unproven_queries():
    """The driver grades exactly the first 50 registry entries. Every query
    that is new or changed (i.e. not on a frozen proven list) must sit
    inside that prefix, or it ships without any driver row."""
    names = list(REGISTRY)
    frozen = R03_PROVEN_FROZEN | R02_PROVEN_FROZEN
    ungraded = [n for n in names[50:] if n not in frozen]
    assert ungraded == [], f"queries past the grading prefix without prior proof: {ungraded}"
