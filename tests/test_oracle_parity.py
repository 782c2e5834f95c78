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
# green in CORRECTNESS_r02.json (rows+schema+hash) and semantically frozen
# since that run — r02 is their standing proof (COVERAGE.md). Anything NOT
# on this list must stay inside the prefix so it gets a driver row.
R02_PROVEN_FROZEN = {
    "s13_json_line", "s14_csv_line", "s15_json_parse",
    "q1_pricing_summary", "q3_top_revenue", "q6_forecast_revenue",
    "q12_shipmode_priority",
    "ann_topk_bruteforce", "ann_lsh_histogram", "ann_lsh_topk", "ann_ivf_topk",
    "lang_id_ngram", "quality_score", "token_count", "doc_fingerprint",
    "p6_word_split_pos", "p7_coord_normalize", "p8_confidence_scale",
    "p10_filename_ts", "j4_point_lookup", "a8_progress_pct",
    "p23_normalize", "p9_frame_time", "p12_date_format",
    # pushed past 50 when pdf_layout_parse entered the prefix; body
    # unchanged since a42e6eb (r2 verdict) — r02 row stands
    "o3_top1_per_group",
    # pushed past 50 when the temporal module entered the prefix; bodies
    # unchanged since a42e6eb (relational.py diff touches only o1) —
    # r02 rows stand
    "w3_running_max", "w4_lead_lag",
    "a5_group_collect_ordered", "a6_match_count",
    # pushed past 50 by quality_c4_rules + dedup_url_canonical; bodies
    # unchanged since a42e6eb — r02 rows stand
    "a1_watermark_max", "a3_resume_antijoin",
    # pushed past 50 by dom_text_density; body unchanged since a42e6eb —
    # r02 row stands
    "j3_pair_by_key",
    # pushed past 50 by pagerank_2iter; body unchanged since a42e6eb —
    # r02 row stands
    "j1_dict_like_join",
    # pushed past 50 by html_outlinks; body unchanged since its r02 row
    # (r3 relational.py diff touched only o1)
    "w1_global_sort",
    # pushed past 50 by kmeans_2iter; body unchanged since a42e6eb —
    # r02 row stands
    "w2_time_rollup",
    # pushed past 50 by quality_gopher_rules; body unchanged since
    # a42e6eb — r02 row stands
    "p11_relative_time",
    # pushed past 50 by hits_2iter; body unchanged since a42e6eb —
    # r02 row stands
    "w2_tree_rollup",
}


def test_grading_prefix_covers_unproven_queries():
    """The driver grades exactly the first 50 registry entries. Every query
    that is new or changed (i.e. not on the frozen r02-proven list) must
    sit inside that prefix, or it ships without any driver row."""
    names = list(REGISTRY)
    ungraded = [n for n in names[50:] if n not in R02_PROVEN_FROZEN]
    assert ungraded == [], f"queries past the grading prefix without prior proof: {ungraded}"
