"""The end-to-end corpus-curation funnel: the training-data pipeline as
one composable job, built from the same graded operators the registry
exposes individually.

    documents
      └─ 1. near-dup removal      (MinHash→LSH→clusters→keep canonical)
      └─ 2. eval-holdout removal  (the held-out slice itself leaves the
                                   training corpus — training on it would
                                   contaminate the eval by construction)
      └─ 3. eval decontamination  (shared-shingle threshold vs held-out slice)
      └─ 4. quality filtering     (Gopher-style repetition thresholds)
      └─ 4b. Gopher rules         (word-count/length/alpha/stopword bounds)
      └─ 5. mixture sampling      (target source proportions, deterministic)
      └─ 6. sequence packing      (two-pass distributed prefix-sum binning)

Every stage is an anti-/semi-join of the survivor set against an
operator's output keyed on doc_id — the corpus rows stream through; the
filter relations are the operators' (much smaller) outputs. Stage
surviving-counts are one count() per stage on the shrinking survivor
relation — the job-summary cost a real pipeline pays too (or replaces
with accumulators).

Reference analog: the reference chains scan→filter→recognize→store per
video (ocs pipeline); this is the corpus-level counterpart for the
training-data layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import tableio
from .queries.common import t
from .queries.curation import (
    decontaminate,
    pack_bins,
    quality_gopher_rules,
    quality_repetition,
)
from .queries.dedup import dedup_keep_canonical
from .queries.sampling import sample_mixture

# default thresholds (tuned to be non-trivial on the synthetic corpus;
# production values come from corpus profiling — nchars_quantiles etc.)
DECON_MIN_SHARED = 3  # drop train docs sharing >= this many eval shingles
MAX_TOP_TOK_FRAC = 0.12  # Gopher-style repetition ceilings
MAX_DUP_BIGRAM_FRAC = 0.08


def curate(
    spark: SparkSession,
    sf: str,
    out_dir: str | None = None,
    decon_min_shared: int = DECON_MIN_SHARED,
    max_top_tok: float = MAX_TOP_TOK_FRAC,
    max_dup_bigram: float = MAX_DUP_BIGRAM_FRAC,
) -> tuple[DataFrame, DataFrame, dict]:
    """Run the funnel; returns (surviving docs, packed bins, stage counts).

    If out_dir is given, writes `<out_dir>/survivors` (doc_id, lang,
    source) and `<out_dir>/packed` (source, bin_id, n_docs, n_chars,
    first_doc) as managed tables via tableio.
    """
    docs = t(spark, sf, "documents")
    stages: dict[str, int] = {"input": docs.count()}

    def _stage(df: DataFrame, name: str) -> DataFrame:
        # materialize each stage boundary once: the count() below plus
        # every later stage / the pack / the writes would otherwise
        # re-execute the whole upstream chain per consumer (Spark shares
        # no common subplans) — same localCheckpoint discipline as
        # decontaminate / dedup_clusters use internally
        df = df.localCheckpoint(eager=True)
        stages[name] = df.count()
        return df

    # 1. near-dup removal — keep each cluster's canonical doc
    survivors = _stage(
        dedup_keep_canonical(spark, sf).select("doc_id", "lang", "source"),
        "after_dedup",
    )

    # 2. remove the held-out eval slice ITSELF from the training corpus:
    # decontaminate() only flags train docs sharing eval shingles — the
    # eval docs would otherwise sail through every anti-join and be
    # trained on, contaminating the eval by construction
    from .queries.curation import EVAL_THRESHOLD
    from .queries.sampling import _hash_key

    survivors = _stage(
        survivors.where(~(_hash_key(F.col("doc_id")) < EVAL_THRESHOLD)),
        "after_holdout",
    )

    # 3. eval-set decontamination — threshold on shared-shingle count
    contaminated = (
        decontaminate(spark, sf)
        .where(F.col("n_shared_shingles") >= decon_min_shared)
        .select("doc_id")
    )
    survivors = _stage(
        survivors.join(contaminated, "doc_id", "left_anti"), "after_decontaminate"
    )

    # 4. repetition-quality filter
    bad_quality = (
        quality_repetition(spark, sf)
        .where(
            (F.col("top_tok_frac") > max_top_tok)
            | (F.col("dup_bigram_frac") > max_dup_bigram)
        )
        .select("doc_id")
    )
    survivors = _stage(
        survivors.join(bad_quality, "doc_id", "left_anti"), "after_quality"
    )

    # 4b. Gopher document-quality rules (word-count / word-length / alpha /
    # stopword bounds) — keep-side semi-join, the second public ruleset
    gopher_keep = (
        quality_gopher_rules(spark, sf).where(F.col("keep")).select("doc_id")
    )
    survivors = _stage(
        survivors.join(gopher_keep, "doc_id", "left_semi"), "after_gopher"
    )

    # 5. deterministic mixture sampling toward target source proportions
    mixed = sample_mixture(spark, sf).select("doc_id")
    survivors = _stage(survivors.join(mixed, "doc_id", "left_semi"), "after_mixture")

    # 6. PII redaction over the survivors — a transform, not a filter:
    # the survivor set is unchanged, the released text is the scrubbed
    # form (row-local map; adds zero shuffle to the funnel). The count
    # recorded is how many surviving docs carried any redaction.
    from .queries.curation import scrub_match_count, scrub_text

    released = docs.join(survivors.select("doc_id"), "doc_id", "left_semi").select(
        "doc_id",
        "source",
        scrub_text(F.col("text")).alias("text"),
        F.col("n_chars"),
        scrub_match_count(F.col("text")).alias("n_redactions"),
    )
    stages["redacted_docs"] = released.where(F.col("n_redactions") > 0).count()

    # 7. pack the surviving corpus into training-sequence bins
    packed = pack_bins(released).localCheckpoint(eager=True)
    stages["packed_bins"] = packed.count()

    if out_dir:
        tableio.write_table(survivors, f"{out_dir.rstrip('/')}/survivors")
        tableio.write_table(packed, f"{out_dir.rstrip('/')}/packed")
    return survivors, packed, stages
