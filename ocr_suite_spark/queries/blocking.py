"""Occupancy-bounded ANN sign-bucket blocking, shared by `knn_self_join`
and `dedup_embedding_cosine` (the r3 VERDICT scale fix).

Through r3 both operators blocked on a FIXED 4-bit sign bucket: 16 blocks
at ANY corpus size, so block population grew linearly with n and the
within-block quadratic term was Θ(n²/16) — fine at sf0.1, a scale-killer
for the two operators whose purpose is all-docs coverage. The scale-safe
form sizes the bit-width from the data:

    bits = clamp(ceil(log2(n / TARGET_OCCUPANCY)),
                 MIN_BLOCK_BITS, MAX_BLOCK_BITS)

so the EXPECTED block population stays ~TARGET_OCCUPANCY at any n and
within-block scoring is O(n x occupancy), linear in n. Two cross-engine
exactness rules:

- the bit-width uses INTEGER comparisons only (smallest b with
  n <= occ * 2^b), never float log2/ceil, so Spark and DuckDB can never
  disagree at a power-of-two boundary;
- it rides in-plan on a broadcast 1-row COUNT relation (Spark) / scalar
  subquery (DuckDB) — no driver-side action, no collected scalar.

Axis-aligned sign planes assume roughly centered dims — measured
0.48-0.52 positive per dim on this corpus. A production deployment with
correlated dims would hash signs of SEEDED RANDOM ROTATIONS instead (and
can mint more planes than dims); the blocking dataflow — bucket id as the
equi-join key — is identical. MIN_BLOCK_BITS keeps small corpora on the
r3-era 4-bit key (sf0.01 resolves to exactly 4 bits, so the r3 driver
rows stay comparable); MAX_BLOCK_BITS=32 binds only past
TARGET_OCCUPANCY * 2^32 ≈ 1.4e11 vectors.

Multi-probe (`knn_probe_buckets`): per-vector recall recovery mirroring
`ann_ivf_multiprobe`'s nprobe knob — the query side probes its own bucket
PLUS the bucket with its least-confident sign bit flipped (the dim with
the smallest |value| among the used planes, i.e. the hyperplane the
vector sits closest to — standard LSH multi-probe, Lv et al. 2007).
Corpus-side assignment stays unique, so no candidate pair is scored
twice; candidate volume is exactly 2x.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TARGET_OCCUPANCY = 32  # expected vectors per block
MIN_BLOCK_BITS = 4  # == the r3 fixed width; binds below n = 32 * 2^4
MAX_BLOCK_BITS = 32  # <= embedding dims (64); binds past ~1.4e11 vectors


def occupancy_bits_col(
    n: Column,
    occ: int = TARGET_OCCUPANCY,
    min_bits: int = MIN_BLOCK_BITS,
    max_bits: int = MAX_BLOCK_BITS,
) -> Column:
    """Smallest b in [min_bits, max_bits] with n <= occ * 2^b — integer
    comparisons only. Defaults are the knn/cosine blocking constants;
    dedup_semdedup reuses the rule with its own floor (K >= 8 cells)."""
    bits = F.lit(min_bits)
    for b in range(min_bits, max_bits):
        bits = bits + F.when(n > F.lit(occ * (1 << b)), 1).otherwise(0)
    return bits.cast("int")


def adaptive_bucket_col(e: Column, bits: Column) -> Column:
    """Sign bucket over the first `bits` dims (the adaptive-width twin of
    similarity._bucket_col)."""
    bucket = F.lit(0)
    for i in range(MAX_BLOCK_BITS):
        bucket = bucket + F.when(
            (F.lit(i) < bits) & (F.element_at(e, i + 1) >= 0), F.lit(1 << i)
        ).otherwise(F.lit(0))
    return bucket.cast("long")


def with_occupancy_bucket(emb: DataFrame, e_col: str = "e") -> DataFrame:
    """Attach `block_bits` + `bk` to an embeddings relation via a broadcast
    1-row count — the count is an aggregate over the same scan (column-
    pruned to nothing), and the join is a 1-row BNLJ, not a shuffle."""
    n1 = F.broadcast(
        emb.agg(occupancy_bits_col(F.count("*")).alias("block_bits"))
    )
    return emb.crossJoin(n1).withColumn(
        "bk", adaptive_bucket_col(F.col(e_col), F.col("block_bits"))
    )


def weakest_bit_col(e: Column, bits: Column) -> Column:
    """1-based index of the least-confident used sign plane: the dim with
    the smallest |value| among dims 1..bits (first on ties — both engines'
    array_position/list_position return the first match)."""
    conf = F.transform(
        F.sequence(F.lit(1), bits), lambda i: F.abs(F.element_at(e, i))
    )
    return F.array_position(conf, F.array_min(conf)).cast("int")


def knn_probe_buckets(emb: DataFrame, e_col: str = "e") -> DataFrame:
    """Query-side probe relation: 2 rows per vector — its own bucket and
    the bucket with the weakest sign bit flipped."""
    own = emb
    flipped = (
        emb.withColumn("weak_bit", weakest_bit_col(F.col(e_col), F.col("block_bits")))
        .withColumn("bk", F.expr("bk ^ shiftleft(CAST(1 AS BIGINT), weak_bit - 1)"))
        .drop("weak_bit")
    )
    return own.unionByName(flipped)


# --- DuckDB mirrors (same integer-exact derivations) -----------------------
#
# The bit-width must be computed ONCE in a 1-row CTE and referenced as a
# plain column (`FROM ..., nb` cross join): inlining a scalar COUNT(*)
# subquery into every CASE term makes DuckDB re-evaluate it per row per
# term — measured as a multi-minute hang at sf0.001.

def duck_bits_cte(
    table: str,
    occ: int = TARGET_OCCUPANCY,
    min_bits: int = MIN_BLOCK_BITS,
    max_bits: int = MAX_BLOCK_BITS,
    name: str = "nb",
) -> str:
    """`{name} AS (SELECT ... AS b FROM {table})` — occupancy_bits_col over
    COUNT(*), one aggregate row."""
    terms = " + ".join(
        f"(CASE WHEN COUNT(*) > {occ * (1 << b)} THEN 1 ELSE 0 END)"
        for b in range(min_bits, max_bits)
    )
    return f"{name} AS (SELECT {min_bits} + {terms} AS b FROM {table})"


def duck_adaptive_bucket_expr(emb_col: str, bits_sql: str) -> str:
    terms = " + ".join(
        f"(CASE WHEN {i} < ({bits_sql}) AND {emb_col}[{i + 1}] >= 0 "
        f"THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(MAX_BLOCK_BITS)
    )
    return f"CAST({terms} AS BIGINT)"


def duck_weakest_bit_expr(emb_col: str, bits_sql: str) -> str:
    conf = f"list_transform(range(1, ({bits_sql}) + 1), i -> abs({emb_col}[i]))"
    return f"list_position({conf}, list_min({conf}))"
