"""Python-oracle invariant tests for the late-r3 pipeline operators:
chunk_windows (tiling/overlap), tfidf_top_terms (rank equivalence), and
lm_unigram_score (score recomputation) — the third engine beside Spark
and DuckDB, same rationale as test_webextract_ops.py.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _tokens(text: str) -> list[str]:
    return [w for w in re.split(r"\s+", text) if len(w) >= 3]


@pytest.fixture(scope="module")
def docs_tokens(spark):
    pdf = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text").toPandas()
    return {r["doc_id"]: _tokens(r["text"]) for _, r in pdf.iterrows()}


def test_chunk_windows_tile_the_token_sequence(spark, docs_tokens):
    from ocr_suite_spark.queries.curation import CHUNK_S, CHUNK_W, chunk_windows

    by_doc: dict[int, dict[int, str]] = {}
    for r in chunk_windows(spark, SF).collect():
        by_doc.setdefault(r["doc_id"], {})[r["win_id"]] = r["win_text"]

    long_docs = 0
    for doc_id, toks in docs_tokens.items():
        if not toks:
            assert doc_id not in by_doc
            continue
        wins = by_doc[doc_id]
        n = len(toks)
        expect_n = 1 if n <= CHUNK_W else (n - CHUNK_W + CHUNK_S - 1) // CHUNK_S + 1
        assert set(wins) == set(range(expect_n))
        for i in range(expect_n):
            assert wins[i] == " ".join(toks[i * CHUNK_S:i * CHUNK_S + CHUNK_W])
        # every token position is covered by some window
        assert (expect_n - 1) * CHUNK_S + CHUNK_W >= n
        if expect_n > 1:
            long_docs += 1
    assert long_docs > 50  # the corpus must exercise the multi-window branch


def test_tfidf_ranks_match_python_oracle(spark, docs_tokens):
    from ocr_suite_spark.queries.textstats import TFIDF_K, tfidf_top_terms

    df_counts: Counter = Counter()
    tf_by_doc = {}
    for doc_id, toks in docs_tokens.items():
        tf = Counter(toks)
        tf_by_doc[doc_id] = tf
        df_counts.update(tf.keys())

    got: dict[int, list] = {}
    for r in tfidf_top_terms(spark, SF).collect():
        got.setdefault(r["doc_id"], []).append(r)

    for doc_id, rows in got.items():
        rows.sort(key=lambda r: r["trank"])
        tf = tf_by_doc[doc_id]
        expect = sorted(tf, key=lambda t: (-tf[t] / df_counts[t], t))[:TFIDF_K]
        assert [r["term"] for r in rows] == expect
        for r in rows:
            assert r["tf"] == tf[r["term"]] and r["df"] == df_counts[r["term"]]
    assert len(got) > 400


def test_lm_unigram_score_matches_python_oracle(spark, docs_tokens):
    from ocr_suite_spark.queries.textstats import lm_unigram_score

    vocab: Counter = Counter()
    for toks in docs_tokens.values():
        vocab.update(toks)
    total = sum(vocab.values())

    checked = 0
    for r in lm_unigram_score(spark, SF).collect():
        toks = docs_tokens[r["doc_id"]]
        assert r["n_tok"] == len(toks)
        s = sum(
            math.floor(math.log10(vocab[t] / total) * 1e6) / 1e6 for t in toks
        )
        expect = math.floor(s / len(toks) * 1000) / 1000
        # 1-ulp transcendental wobble can at worst move one 1e-6-grid term
        assert abs(r["lm_score3"] - expect) <= 1e-3 + 1e-9
        # scores are negative log-probs of a <=n-token corpus: sanity band
        assert -10.0 < r["lm_score3"] < 0.0
        checked += 1
    assert checked > 400


def test_gopher_rules_match_python_oracle(spark, docs_tokens):
    """quality_gopher_rules' four signals and keep flag recomputed
    independently in Python over the same normalized token stream."""
    import math

    from ocr_suite_spark.queries.curation import (
        GOPHER_MAX_MWL,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA,
        GOPHER_MIN_MWL,
        GOPHER_MIN_STOP,
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
        quality_gopher_rules,
    )

    rows = {r["doc_id"]: r for r in quality_gopher_rules(spark, SF).collect()}
    kept = dropped = 0
    for doc_id, toks in docs_tokens.items():
        if not toks:
            assert doc_id not in rows
            continue
        r = rows[doc_id]
        n = len(toks)
        mwl = math.floor(sum(len(t) for t in toks) / n * 1000) / 1000
        alpha = (
            math.floor(
                sum(1 for t in toks if re.search("[a-zA-Z]", t)) / n * 1000
            )
            / 1000
        )
        n_stop = len({t for t in toks if t in GOPHER_STOPWORDS})
        assert (r["n_words"], r["mean_word_len"], r["alpha_frac"], r["n_stop"]) == (
            n, mwl, alpha, n_stop
        ), doc_id
        keep = (
            GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS
            and GOPHER_MIN_MWL <= mwl <= GOPHER_MAX_MWL
            and alpha >= GOPHER_MIN_ALPHA
            and n_stop >= GOPHER_MIN_STOP
        )
        assert r["keep"] == keep, doc_id
        kept += keep
        dropped += not keep
    # the thresholds must actually discriminate on this corpus
    assert kept > 100 and dropped > 10


def test_decontaminate_bloom_path_identical(spark):
    """The large-scale Bloom-broadcast path (r3 VERDICT ask #6) must be
    output-identical to the exact small-SF form: the Bloom has no false
    negatives, false positives die in the exact semi-join, and the
    hot-shingle DF decides identically on the matched stream. The bloom
    prefilter is Arrow-batched (never row-Python) and only the matched
    stream is distinct-ed/materialized."""
    from ocr_suite_spark.queries.curation import _decon_matched_bloom, decontaminate

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        small = {
            (r["doc_id"], r["n_shared_shingles"])
            for r in decontaminate(spark, sf, large_scale=False).collect()
        }
        large = {
            (r["doc_id"], r["n_shared_shingles"])
            for r in decontaminate(spark, sf, large_scale=True).collect()
        }
        assert small == large, sf
    plan = (
        _decon_matched_bloom(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_bloom_distributed_build_bit_identical(spark):
    """The r5 distributed Bloom compile (per-partition packed arrays,
    driver OR of <= 32 arrays — no eval-row collect) must produce the
    exact bits the driver-side build does."""
    from ocr_suite_spark.queries.curation import (
        DECON_BLOOM_FPP,
        _Bloom,
        _bloom_distributed,
        _eval_split,
    )

    _, _, eval_sh = _eval_split(spark, "/root/testdata/sf0.001")
    eval_sh = eval_sh.localCheckpoint(eager=True)
    dist = _bloom_distributed(eval_sh, DECON_BLOOM_FPP)
    ref = _Bloom([r["sh"] for r in eval_sh.collect()], DECON_BLOOM_FPP)
    assert (dist.m, dist.k) == (ref.m, ref.k)
    assert (dist.bits == ref.bits).all()
    assert dist.bits.any()  # non-degenerate: the slice has shingles


def _ref_bpe(docs_tokens):
    """Greedy reference BPE (Sennrich et al. 2016) in pure Python over the
    same token stream: per round the top pair by (count desc,
    lexicographic) is merged left-to-right non-overlapping. Returns the
    merge table and the final symbol sequences."""
    from ocr_suite_spark.queries.textstats import BPE_MERGES

    seqs = [list(tok) for toks in docs_tokens.values() for tok in toks]
    merges = []
    for step in range(1, BPE_MERGES + 1):
        counts: Counter = Counter()
        for s in seqs:
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += 1
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, a + b, n))
        for s in seqs:
            i = 0
            while i < len(s) - 1:
                if s[i] == a and s[i + 1] == b:
                    s[i : i + 2] = [a + b]  # greedy left-to-right
                i += 1
    return merges, seqs


def test_bpe_merge_learn_matches_python_oracle(spark, docs_tokens):
    """Third engine for the r5 BPE training loop: the reference merge
    table (top pair + its count per round) must match the Spark merge
    table exactly, including left-to-right non-overlapping application."""
    from ocr_suite_spark.queries.textstats import bpe_merge_learn

    want, _ = _ref_bpe(docs_tokens)
    got = [
        (int(r["step"]), r["left_sym"], r["right_sym"], r["merged"], int(r["n"]))
        for r in bpe_merge_learn(spark, SF).orderBy("step").collect()
    ]
    assert got == want


def test_bpe_encode_stats_matches_python_oracle(spark, docs_tokens):
    """Third engine for the r5 BPE apply step: encode the corpus with the
    reference merges and count final symbols — the Spark top-30 (n desc,
    sym) table must match. Guards that the frequency-weighted dictionary
    encoding equals per-instance encoding."""
    from ocr_suite_spark.queries.textstats import BPE_ENCODE_TOP, bpe_encode_stats

    _, seqs = _ref_bpe(docs_tokens)
    counts: Counter = Counter(sym for s in seqs for sym in s)
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_ENCODE_TOP]
    got = [
        (r["sym"], int(r["n"]))
        for r in bpe_encode_stats(spark, SF).orderBy(F.desc("n"), "sym").collect()
    ]
    assert got == want


def test_dsir_importance_matches_python_oracle(spark, docs_tokens):
    """Third engine for the r5 DSIR operator: recompute the hashed-n-gram
    bucket distributions and every document's length-normalized log
    likelihood ratio in pure Python, and check the lang='en' target slice
    scores higher on average than the rest (the selection signal DSIR
    resampling relies on)."""
    import hashlib

    from ocr_suite_spark.queries.textstats import (
        DSIR_BUCKETS,
        DSIR_TARGET_LANG,
        dsir_importance,
    )

    langs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS

    c_q: Counter = Counter()
    c_p: Counter = Counter()
    doc_buckets: dict[int, list[int]] = {}
    for doc_id, toks in docs_tokens.items():
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        bs = [bucket(g) for g in grams]
        doc_buckets[doc_id] = bs
        c_q.update(bs)
        if langs[doc_id] == DSIR_TARGET_LANG:
            c_p.update(bs)
    n_q = sum(c_q.values())
    n_p = sum(c_p.values())
    lam = {
        b: math.floor(
            math.log10(
                (c_p[b] + 1) * (n_q + DSIR_BUCKETS)
                / ((c_q[b] + 1) * (n_p + DSIR_BUCKETS))
            )
            * 1e6
        )
        / 1e6
        for b in c_q
    }

    by_lang_sum: dict[bool, list[float]] = {True: [], False: []}
    checked = 0
    for r in dsir_importance(spark, SF).collect():
        bs = doc_buckets[r["doc_id"]]
        assert r["n_grams"] == len(bs)
        if not bs:
            assert r["dsir_score3"] == 0.0
            continue
        s = sum(lam[b] for b in bs)
        expect = math.floor(s / len(bs) * 1000) / 1000
        # 1-ulp transcendental wobble can at worst move one 1e-6-grid term
        assert abs(r["dsir_score3"] - expect) <= 1e-3 + 1e-9
        by_lang_sum[langs[r["doc_id"]] == DSIR_TARGET_LANG].append(r["dsir_score3"])
        checked += 1
    assert checked > 400
    mean_t = sum(by_lang_sum[True]) / len(by_lang_sum[True])
    mean_o = sum(by_lang_sum[False]) / len(by_lang_sum[False])
    assert mean_t > mean_o  # target docs must look more like the target


def test_dedup_substring_spans_matches_python_oracle(spark, docs_tokens):
    """Third engine for the r5 substring-dedup operator: recompute every
    document's duplicated K-gram positions and merged spans in pure Python
    (Lee et al. 2021 semantics at K-bounded resolution) and compare
    exactly; the corpus must actually exercise the duplicate branch."""
    from ocr_suite_spark.queries.dedup import SUBSTR_K, dedup_substring_spans

    gram_count: Counter = Counter()
    doc_grams: dict[int, list[str]] = {}
    for doc_id, toks in docs_tokens.items():
        gs = [
            " ".join(toks[i : i + SUBSTR_K])
            for i in range(len(toks) - SUBSTR_K + 1)
        ]
        doc_grams[doc_id] = gs
        gram_count.update(gs)

    dup_docs = 0
    merged_multi = 0
    for r in dedup_substring_spans(spark, SF).collect():
        gs = doc_grams[r["doc_id"]]
        dup_pos = [i for i, g in enumerate(gs) if gram_count[g] > 1]
        spans = 0
        prev = None
        for p in dup_pos:
            if prev is None or p - prev > SUBSTR_K:
                spans += 1
            prev = p
        assert r["n_grams"] == len(gs)
        assert r["n_dup_grams"] == len(dup_pos)
        assert r["n_dup_spans"] == spans
        expect = (
            math.floor(len(dup_pos) / len(gs) * 1000) / 1000 if gs else 0.0
        )
        assert r["dup_frac3"] == expect
        if dup_pos:
            dup_docs += 1
        if len(dup_pos) > spans:
            merged_multi += 1
    assert dup_docs > 5  # the corpus must contain cross-doc duplication
    assert merged_multi > 0  # and overlapping windows must actually merge


def test_dedup_substring_spans_merge_boundary(spark, tmp_path):
    """Pin the span-merge boundary exactly: duplicated window starts at
    gap == SUBSTR_K merge into one span (the windows touch), gap ==
    SUBSTR_K + 1 split into two. Crafted corpus: C = the shared 8-gram;
    docs A/B carry one copy each (cross-doc dup), D carries two copies
    back-to-back (gap K), E two copies split by one token (gap K+1),
    F is too short to produce any gram."""
    from ocr_suite_spark.queries.dedup import SUBSTR_K, dedup_substring_spans

    assert SUBSTR_K == 8  # the crafted layouts below encode K=8
    c = [f"caa{i}" for i in range(8)]
    docs = [
        (1, " ".join(c + [f"uqz{i}" for i in range(10)])),   # A
        (2, " ".join(c + [f"vqz{i}" for i in range(10)])),   # B
        (3, " ".join(c + c)),                                 # D: gap K
        (4, " ".join(c + ["xqz0"] + c)),                      # E: gap K+1
        (5, "short doc"),                                     # F: no gram
    ]
    sf = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["n_dup_spans"], r["dup_frac3"])
        for r in dedup_substring_spans(spark, sf).collect()
    }
    assert got[1] == (11, 1, 1, math.floor(1 / 11 * 1000) / 1000)
    assert got[2] == (11, 1, 1, math.floor(1 / 11 * 1000) / 1000)
    assert got[3] == (9, 2, 1, math.floor(2 / 9 * 1000) / 1000)   # touching: merge
    assert got[4] == (10, 2, 2, math.floor(2 / 10 * 1000) / 1000)  # gap K+1: split
    assert got[5] == (0, 0, 0, 0.0)
