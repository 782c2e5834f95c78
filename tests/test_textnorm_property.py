"""Normalizer equivalence across all three engines (python kernel, Spark
Column expression, DuckDB oracle fragment) on adversarial inputs, plus
hypothesis property tests for the pure-python kernel.

The trap being defended: python's bare str.split() treats unicode
whitespace (NBSP, EM SPACE, ...) as separators while Java regex \\s and
RE2 \\s are ASCII-only — an oracle that silently used unicode semantics
would "pass" on ASCII testdata and diverge on real web text.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_suite_spark import MIN_TOKEN_LEN
from ocr_suite_spark.kernels.textnorm import normalize_text

ADVERSARIAL = [
    "",
    "   ",
    "\t\n\r\f\v",
    "ab cde  fgh",
    "abc\vdef ghi",      # \v IS a separator in all three engines (RE2 \s
    "wxy\vz",            # would not split it — DUCK fragments use an
    "\vabc\v",           # explicit class; ADVICE r1)
    "  leading and trailing  ",
    "a\xa0bcd",          # NBSP is NOT a separator for the engines
    "xx\xa0yy zz",       # 'xx<NBSP>yy' is one 5-char token
    "wide\u2003gap",     # EM SPACE inside a token (not a separator)
    "\xa0abc\xa0",      # NBSP at the edges survives ASCII trim everywhere
    "tab\tsep\nnl\rcr",
    "exactly3 ab abc abcd",
    "\xfcn\xefcode t\xf6kens \xf6k",
    "emoji \U0001f642 ok",
    "mixed \t ws",
    "a" * 500 + " bb " + "c" * 3,
]


def _duck_norm(s: str) -> str:
    con = duckdb.connect()
    row = con.execute(
        r"""
        SELECT list_aggregate(
                 list_filter(string_split_regex(?, '[ \t\n\r\f\x0b]+'), x -> length(x) >= 3),
                 'string_agg', ' ')
        """,
        [s],
    ).fetchone()[0]
    return row or ""


def test_three_engines_agree_on_adversarial_inputs(spark):
    from pyspark.sql import functions as F

    from ocr_suite_spark.operators.extract import normalize_text_col

    df = spark.createDataFrame([(i, s) for i, s in enumerate(ADVERSARIAL)], "i int, s string")
    got_spark = {
        r["i"]: r["n"]
        for r in df.select("i", normalize_text_col(F.col("s")).alias("n")).collect()
    }
    for i, s in enumerate(ADVERSARIAL):
        py = normalize_text(s)
        assert got_spark[i] == py, (s, got_spark[i], py)
        assert _duck_norm(s) == py, (s, _duck_norm(s), py)


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_normalize_idempotent_and_clean(s):
    out = normalize_text(s)
    # idempotent
    assert normalize_text(out) == out
    # every output token passes the filter; single-space separated
    if out:
        toks = out.split(" ")
        assert all(len(t) >= MIN_TOKEN_LEN for t in toks)
        assert "  " not in out and not out.startswith(" ") and not out.endswith(" ")


@given(st.lists(st.text(alphabet="abcdefg \t", max_size=12), max_size=8))
@settings(max_examples=200, deadline=None)
def test_normalize_equals_duckdb_on_generated(words):
    s = " ".join(words)
    assert _duck_norm(s) == normalize_text(s)
