"""Semantic tests for the web-extraction curation operators beyond oracle
parity: pdf_layout_parse's reading-order/boilerplate invariants and
pii_scrub's redaction completeness, each checked against an independent
pure-Python computation (a third engine besides Spark and DuckDB).
"""

from __future__ import annotations

import hashlib
import re

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pdf_rows(spark):
    from ocr_suite_spark.queries.webextract import pdf_layout_parse

    return {r["doc_id"]: r for r in pdf_layout_parse(spark, SF).collect()}


@pytest.fixture(scope="module")
def docs_pd(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    ).toPandas()


def _words(text: str) -> list[str]:
    return [w for w in re.split(r"[ \t\n\r\f\x0b]+", text) if w]


def test_pdf_fragment_and_drop_counts(pdf_rows, docs_pd):
    """n_frags = words + header + footer per page; footers always drop,
    headers drop only when repetition is observable (>= 2 pages)."""
    from ocr_suite_spark.queries.webextract import WORDS_PER_PAGE

    checked = 0
    for _, d in docs_pd.iterrows():
        words = _words(d["text"])
        if not words:
            assert d["doc_id"] not in pdf_rows
            continue
        row = pdf_rows[d["doc_id"]]
        n_pages = (len(words) - 1) // WORDS_PER_PAGE + 1
        assert row["n_pages"] == n_pages
        assert row["n_frags"] == len(words) + 2 * n_pages
        expect_drop = 2 * n_pages if n_pages >= 2 else 1
        assert row["n_dropped"] == expect_drop
        checked += 1
    assert checked > 100


def test_pdf_reading_order_matches_python_oracle(pdf_rows, docs_pd):
    """body_text equals the independent Python reassembly: column-major
    within each page, single-page headers retained, footers stripped."""
    from ocr_suite_spark.queries.webextract import WORDS_PER_PAGE

    multi = single = 0
    for _, d in docs_pd.iterrows():
        words = _words(d["text"])
        if not words:
            continue
        n_pages = (len(words) - 1) // WORDS_PER_PAGE + 1
        body = []
        for p in range(n_pages):
            page_words = words[p * WORDS_PER_PAGE:(p + 1) * WORDS_PER_PAGE]
            if n_pages == 1:  # header survives: top band sorts first
                body.append(f"CONFIDENTIAL {d['source']}")
            for col in (0, 1):
                body.extend(w for i, w in enumerate(page_words) if i % 2 == col)
        assert pdf_rows[d["doc_id"]]["body_text"] == " ".join(body)
        if n_pages >= 2:
            multi += 1
        else:
            single += 1
    # the corpus must actually exercise both branches
    assert multi > 10 and single > 10


@pytest.fixture(scope="module")
def dom_rows(spark):
    from ocr_suite_spark.queries.webextract import dom_text_density

    return {r["doc_id"]: r for r in dom_text_density(spark, SF).collect()}


def test_dom_density_matches_python_oracle(dom_rows, docs_pd):
    """body_text equals the independent Python classification: both content
    halves kept iff they clear the word floor (they carry no anchors), nav /
    link-farm / footer always dropped (density boundary or beyond)."""
    from ocr_suite_spark.queries.webextract import MIN_BLOCK_WORDS

    both = 0
    for _, d in docs_pd.iterrows():
        words = _words(d["text"])
        h = (len(words) + 1) // 2
        halves = [words[:h], words[h:]]
        kept = [" ".join(w) for w in halves if len(w) >= MIN_BLOCK_WORDS]
        row = dom_rows[d["doc_id"]]
        assert row["body_text"] == " ".join(kept), d["doc_id"]
        assert row["n_kept"] == len(kept)
        # dropped (nonempty): nav + footer always, link-farm on doc_id % 3 == 0,
        # plus any nonempty content half under the word floor
        short = sum(1 for w in halves if 0 < len(w) < MIN_BLOCK_WORDS)
        expect_drop = 2 + (1 if d["doc_id"] % 3 == 0 else 0) + short
        assert row["n_dropped"] == expect_drop, d["doc_id"]
        if len(kept) == 2:
            both += 1
    # the corpus must exercise the multi-block keep that argmax cannot express
    assert both > 100


@pytest.fixture(scope="module")
def scrub_rows(spark):
    from ocr_suite_spark.queries.curation import pii_scrub

    return pii_scrub(spark, SF).collect()


def test_pii_scrub_removes_every_match(scrub_rows):
    from ocr_suite_spark.queries.curation import _EMAIL_RE, _IP_RE, _PHONE_RE

    for row in scrub_rows:
        for pat in (_EMAIL_RE, _PHONE_RE, _IP_RE):
            assert not re.search(pat, row["text_scrubbed"]), (row["doc_id"], pat)


def test_pii_scrub_counts_match_python_injection(scrub_rows):
    """Counts agree with Python's re over the independently re-derived
    injection (md5-presence thresholds and ascii-digit values)."""
    n_em = n_ph = n_ip = 0
    for row in scrub_rows:
        h = hashlib.md5(str(row["doc_id"]).encode()).hexdigest()
        assert row["n_emails"] >= (1 if h[8] < "c" else 0)
        assert row["n_phones"] >= (1 if h[16] < "8" else 0)
        assert row["n_ips"] >= (1 if h[20] < "4" else 0)
        if h[8] < "c":
            assert f"{h[:8]}@example.com" not in row["text_scrubbed"]
        n_em += row["n_emails"]
        n_ph += row["n_phones"]
        n_ip += row["n_ips"]
    # non-vacuous and category rates ordered as designed (~75/50/25%)
    assert n_em > n_ph > n_ip > 0
