"""Property test: pack_bins' two-pass distributed prefix sum is
output-identical to the sequential per-source greedy definition on
adversarial shapes (one giant source, singleton sources, zero-length and
boundary-straddling docs) — the correctness core of the r3 rewrite that
removed the per-source window funnel."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_suite_spark.queries.curation import PACK_CAP, PACK_TOK_CAP, pack_bins

DOCS_SCHEMA = "source string, doc_id long, n_chars long"


def _reference_bins(rows: list[tuple[str, int, int]]) -> set[tuple]:
    """The definition: per source in doc_id order, bin = floor(exclusive
    running total / PACK_CAP); then the same aggregation pack_bins emits."""
    df = pd.DataFrame(rows, columns=["source", "doc_id", "n_chars"])
    out = []
    for src, g in df.groupby("source"):
        run = 0
        for _, r in g.sort_values("doc_id").iterrows():
            out.append((src, int(r["doc_id"]), int(r["n_chars"]), run // PACK_CAP))
            run += int(r["n_chars"])
    ref = pd.DataFrame(out, columns=["source", "doc_id", "n_chars", "bin_id"])
    agg = (
        ref.groupby(["source", "bin_id"])
        .agg(
            n_docs=("doc_id", "size"),
            n_chars=("n_chars", "sum"),
            first_doc=("doc_id", "min"),
        )
        .reset_index()
    )
    return {
        (r.source, int(r.bin_id), int(r.n_docs), int(r.n_chars), int(r.first_doc))
        for r in agg.itertuples(index=False)
    }


def _spark_bins(spark, rows: list[tuple[str, int, int]]) -> set[tuple]:
    got = pack_bins(spark.createDataFrame(rows, DOCS_SCHEMA)).collect()
    return {
        (r["source"], int(r["bin_id"]), int(r["n_docs"]), int(r["n_chars"]), int(r["first_doc"]))
        for r in got
    }


# biased source pool: index 0 drawn most of the time = one giant source
_doc = st.tuples(
    st.sampled_from(["giant"] * 7 + ["s2", "s3", "s4"]),
    st.integers(min_value=0, max_value=999),
    st.one_of(
        st.integers(min_value=0, max_value=PACK_CAP // 3),
        st.integers(min_value=PACK_CAP - 2, max_value=3 * PACK_CAP),  # straddlers
    ),
)


@st.composite
def _corpus(draw):
    docs = draw(st.lists(_doc, min_size=1, max_size=60))
    seen, rows = set(), []
    for src, did, n in docs:  # doc_id unique corpus-wide, like the real table
        if did not in seen:
            seen.add(did)
            rows.append((src, did, n))
    return rows


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_corpus())
def test_pack_bins_matches_sequential_definition(spark, rows):
    assert _spark_bins(spark, rows) == _reference_bins(rows)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_corpus())
def test_pack_bins_token_budget_matches_sequential_definition(spark, rows):
    """The generalized (size_col, cap) form used by pack_sequences_tokens:
    same prefix-sum machinery, token budget instead of chars."""
    cap = PACK_TOK_CAP
    rows_tok = [(s_, d, n % (3 * cap)) for s_, d, n in rows]
    df = pd.DataFrame(rows_tok, columns=["source", "doc_id", "n_tokens"])
    out = []
    for src, g in df.groupby("source"):
        run = 0
        for _, r in g.sort_values("doc_id").iterrows():
            out.append((src, int(r["doc_id"]), int(r["n_tokens"]), run // cap))
            run += int(r["n_tokens"])
    ref = pd.DataFrame(out, columns=["source", "doc_id", "n_tokens", "bin_id"])
    agg = (
        ref.groupby(["source", "bin_id"])
        .agg(n_docs=("doc_id", "size"), n_tokens=("n_tokens", "sum"),
             first_doc=("doc_id", "min"))
        .reset_index()
    )
    want = {
        (r.source, int(r.bin_id), int(r.n_docs), int(r.n_tokens), int(r.first_doc))
        for r in agg.itertuples(index=False)
    }
    got = pack_bins(
        spark.createDataFrame(rows_tok, "source string, doc_id long, n_tokens long"),
        size_col="n_tokens", cap=cap,
    ).collect()
    got = {
        (r["source"], int(r["bin_id"]), int(r["n_docs"]), int(r["n_tokens"]), int(r["first_doc"]))
        for r in got
    }
    assert got == want


@pytest.mark.parametrize(
    "rows",
    [
        [("s", 0, 0)],  # single zero-length doc
        [("s", 5, 5 * PACK_CAP)],  # one doc spanning many caps
        [("s", i, 1) for i in range(200)],  # many tiny docs across chunks
        [(f"s{i}", i, PACK_CAP) for i in range(10)],  # singleton sources
    ],
)
def test_pack_bins_edge_shapes(spark, rows):
    assert _spark_bins(spark, rows) == _reference_bins(rows)


def test_pack_bins_empty(spark):
    assert _spark_bins(spark, []) == set()
