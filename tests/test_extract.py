"""End-to-end pipeline tests: Spark extraction vs the pandas oracle.

The BASELINE.json per-row invariant: span-sequence equality
(kind, text, media_ref, order) per document.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_suite_spark import datagen
from ocr_suite_spark.operators import extract as X
from ocr_suite_spark.oracle import extract_pandas


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    d = datagen.interleaved_from_documents(spark, sf_dir).cache()
    d.count()
    return d


def _spark_sequences(merged_df) -> dict[str, list[tuple]]:
    rows = merged_df.collect()
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]]
        for r in rows
    }


def test_datagen_shape(docs):
    assert docs.columns == ["doc_id", "spans"]
    names = [f.name for f in docs.schema["spans"].dataType.elementType.fields]
    assert names == ["kind", "text", "media_ref", "offset"]
    n = docs.count()
    assert n == 500  # sf0.001 documents rows
    kinds = (
        docs.select(F.explode("spans").alias("s"))
        .groupBy("s.kind")
        .count()
        .collect()
    )
    by_kind = {r["kind"]: r["count"] for r in kinds}
    assert by_kind.get("text", 0) > 0 and by_kind.get("media", 0) > 0


def test_datagen_deterministic(spark, sf_dir, docs):
    again = datagen.interleaved_from_documents(spark, sf_dir)
    a = {r["doc_id"]: r["spans"] for r in docs.collect()}
    b = {r["doc_id"]: r["spans"] for r in again.collect()}
    assert a == b


def test_flagship_matches_pandas_oracle(spark, docs):
    # Spark pipeline (8 threads, salted, Arrow-batched)
    got = _spark_sequences(X.extract(docs))
    # pure-pandas oracle on the same input
    want = extract_pandas(docs.toPandas())
    assert set(got) == set(want)
    mismatches = {d: (got[d], want[d]) for d in want if got[d] != want[d]}
    assert not mismatches, list(mismatches.items())[:3]


def test_media_spans_recognized_nonempty(docs):
    flat = X.extract_flat(docs)
    media = flat.where(F.col("kind") == "media")
    n_media = media.count()
    n_empty = media.where(F.length("text") == 0).count()
    assert n_media > 0
    assert n_empty == 0  # every synthetic image recognizes to its payload


def test_normalizer_column_matches_python(spark, sf_dir):
    from ocr_suite_spark.kernels.textnorm import normalize_text

    raw = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    got = raw.select("text", X.normalize_text_col(F.col("text")).alias("norm")).collect()
    for r in got:
        assert r["norm"] == normalize_text(r["text"])
    # edge cases through a literal DataFrame
    edge = spark.createDataFrame(
        [("",), ("  ",), (" ab  x ",), ("abc  de fgh  ",)], "text string"
    )
    for r in edge.select("text", X.normalize_text_col(F.col("text")).alias("n")).collect():
        assert r["n"] == normalize_text(r["text"])


def test_extract_words_have_boxes(docs):
    words = X.extract_words(docs.limit(20))
    rows = words.collect()
    assert rows
    for r in rows[:50]:
        assert len(r["word"]) >= 3
        assert r["left"] < r["right"] and r["top"] < r["bottom"]
        assert 0.0 <= r["confidence"] <= 100.0


def test_count_stable_across_parallelism(docs):
    """Reference value_queue invariant (test/src/value_queue.cpp): produced ==
    consumed regardless of scheduling — here: results identical across
    repartitionings."""
    a = X.extract_flat(docs).count()
    b = X.extract_flat(docs.repartition(17)).count()
    assert a == b


def test_content_identical_across_parallelism(docs):
    """Stronger than the count check: full span-sequence CONTENT equality
    across physical partitionings — the cluster-size-independence the
    north rule's N-vs-4N criterion presumes (same input, any layout, same
    rows)."""
    a = _spark_sequences(X.extract(docs.limit(80)))
    b = _spark_sequences(X.extract(docs.limit(80).repartition(13)))
    assert a == b


def test_synthesize_slices_disjoint(spark):
    """Scaling-bench contract: corpora at different id offsets share the
    content distribution but no media_ref (each timed run sees fresh
    images, as a production run over new data would)."""
    a = datagen.synthesize(spark, 200, partitions=4, start=0)
    b = datagen.synthesize(spark, 200, partitions=4, start=200)
    refs = lambda df: {
        r["r"]
        for r in df.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("r"))
        .collect()
    }
    ra, rb = refs(a), refs(b)
    assert ra and rb and not (ra & rb)


def test_like_search_guard(spark, docs):
    """P4: the viewer rejects sub-3-char queries before any work is
    scheduled (reference search.cpp:169-172)."""
    from ocr_suite_spark.queries.extraction import like_search

    flat = X.extract_flat(docs.limit(10))
    for bad in ("a%", "ab%", "", "ab"):
        with pytest.raises(ValueError, match="shorter than"):
            like_search(flat, bad)
    # 3 effective chars is allowed; lazily returns a plan, no action yet
    assert like_search(flat, "abc%") is not None


def test_periodic_reporter_emits_during_job(spark, docs):
    """T7: the 5s cadence reporter ticks while the job runs (interval shrunk
    for the test) and its interval rates/totals are sane."""
    from ocr_suite_spark.metrics import PeriodicReporter, SpeedMeter

    meter = SpeedMeter(spark)
    lines: list[str] = []
    with PeriodicReporter(meter, interval_s=0.2, sink=lines.append) as rep:
        X.extract_flat(docs.limit(60), meter=meter).write.mode("overwrite").format(
            "noop"
        ).save()
    assert rep.reports, "no reports emitted"
    assert lines and all(line.startswith("[speed]") for line in lines)
    final = rep.reports[-1]
    assert final["n_images_total"] > 0
    assert all(r["images_per_sec"] >= 0 for r in rep.reports)
    # totals are monotone across ticks
    totals = [r["n_images_total"] for r in rep.reports]
    assert totals == sorted(totals)


def test_quarantine_mode_survives_corrupt_media(spark):
    """A poison payload must cost one row, not the job: on_error='quarantine'
    yields a NULL-text span + an n_errors count; the default still fails."""
    from ocr_suite_spark.kernels.render import make_media_ref
    from ocr_suite_spark.metrics import SpeedMeter
    from ocr_suite_spark.schema import DOCUMENTS

    docs = spark.createDataFrame(
        [
            ("ok1", [{"kind": "media", "text": None, "media_ref": make_media_ref(["alpha"], 0, 1), "offset": 1}]),
            ("bad", [{"kind": "media", "text": None, "media_ref": "img://v1/NOT_A_VALID_REF", "offset": 1}]),
        ],
        DOCUMENTS,
    )
    meter = SpeedMeter(spark)
    rows = {
        r["doc_id"]: r["text"]
        for r in X.extract_flat(docs, on_error="quarantine", meter=meter).collect()
    }
    assert rows["ok1"] == "alpha"
    assert rows["bad"] is None  # quarantined, row survives
    assert meter.n_errors.value == 1
    # default mode: the corrupt payload fails the job (after task retries)
    with pytest.raises(Exception, match="unrecognized media_ref"):
        X.extract_flat(docs).collect()


def test_quarantine_mode_words(spark):
    """extract_words twin of the quarantine test: a corrupt payload drops
    that span's word rows (counted once per distinct ref on n_errors, not
    per occurrence) while healthy spans keep theirs; default still fails."""
    from ocr_suite_spark.kernels.render import make_media_ref
    from ocr_suite_spark.metrics import SpeedMeter
    from ocr_suite_spark.schema import DOCUMENTS

    bad_ref = "img://v1/NOT_A_VALID_REF"
    docs = spark.createDataFrame(
        [
            ("ok1", [{"kind": "media", "text": None, "media_ref": make_media_ref(["alpha"], 0, 1), "offset": 1}]),
            # same corrupt ref twice in ONE doc: memoized sentinel must make
            # the second occurrence free (no second decode attempt/count on
            # the worker that owns it)
            ("bad", [
                {"kind": "media", "text": None, "media_ref": bad_ref, "offset": 1},
                {"kind": "media", "text": None, "media_ref": bad_ref, "offset": 2},
            ]),
        ],
        DOCUMENTS,
    )
    meter = SpeedMeter(spark)
    # salt_partitions=1: both occurrences land on one worker, so the
    # distinct-payload error count is exactly 1 (cross-worker repeats
    # legitimately count once per worker)
    rows = X.extract_words(
        docs, salt_partitions=1, on_error="quarantine", meter=meter
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["word"])
    assert by_doc.get("ok1") == ["alpha"]
    assert "bad" not in by_doc  # quarantined span yields no word rows
    assert meter.n_errors.value == 1
    with pytest.raises(Exception, match="unrecognized media_ref"):
        X.extract_words(docs).collect()


def test_extract_edge_inputs(spark):
    """Empty input, text-only docs, media-only docs — the routed union must
    handle an empty branch on either side (and the stats-sized salt
    partitioning must not choke on zero-row estimates)."""
    from ocr_suite_spark.schema import DOCUMENTS

    empty = spark.createDataFrame([], DOCUMENTS)
    assert X.extract(empty).count() == 0

    text_only = spark.createDataFrame(
        [("t1", [{"kind": "text", "text": "  alpha bq gamma  ", "media_ref": None, "offset": 0}])],
        DOCUMENTS,
    )
    rows = {r["doc_id"]: r["spans"] for r in X.extract(text_only).collect()}
    assert [s["text"] for s in rows["t1"]] == ["alpha gamma"]  # min-len strip

    from ocr_suite_spark.kernels.render import make_media_ref

    media_only = spark.createDataFrame(
        [("m1", [{"kind": "media", "text": None, "media_ref": make_media_ref(["alpha"], 2, 5), "offset": 3}])],
        DOCUMENTS,
    )
    rows = {r["doc_id"]: r["spans"] for r in X.extract(media_only).collect()}
    assert [(s["kind"], s["text"], s["order"]) for s in rows["m1"]] == [("media", "alpha", 3)]
