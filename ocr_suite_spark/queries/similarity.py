"""Similarity search over the embeddings table (array<float> column).

- brute-force cosine top-k: the correctness baseline;
- LSH-bucketed variant (sign bits of leading dims = deterministic random-
  hyperplane stand-in): the scale path — candidate set shrinks from n to
  bucket size, the join key becomes the bucket id.

Dot products fold sequentially in float64 on both engines (Spark
F.aggregate vs DuckDB list_dot_product), scores surfaced at fixed 3-decimal
precision so cross-engine last-bit drift can't flip the comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .common import t
from .dedup import _cos

N_QUERIES = 8  # vec_id < 8 are the query vectors
TOP_K = 5
N_SIGN_BITS = 8


def _scored_pairs(spark: SparkSession, sf: str) -> DataFrame:
    emb = t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    # broadcast the QUERY side explicitly: at sample SF either side fits,
    # and the planner may pick the corpus as build side (BuildRight) —
    # which OOMs at 10^12 scale. The hint pins the only plan that scales:
    # tiny queries replicated, one streaming pass over the corpus.
    q = F.broadcast(emb.where(F.col("vec_id") < N_QUERIES)).alias("q")
    c = emb.alias("c")
    cos = _cos(F.col("q.e"), F.col("c.e"))
    return (
        q.join(c, F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            (F.floor(cos * 1000) / 1000).alias("cos3"),
        )
    )


def ann_topk_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    Scale: broadcast the (tiny) query set against the full corpus — one
    scan, no shuffle of the big side; per-query top-k via window on the
    (queries x corpus) scores, which AQE keeps partition-local per query.
    """
    scored = _scored_pairs(spark, sf)
    w = W.partitionBy("query_id").orderBy(F.col("cos3").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", "cos3")
    )


_DUCK_COS = (
    "FLOOR(list_dot_product(q.emb, c.emb) / "
    "(sqrt(list_dot_product(q.emb, q.emb)) * sqrt(list_dot_product(c.emb, c.emb))) "
    "* 1000) / 1000"
)

ANN_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_DUCK_COS} AS cos3
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, rnk, cos3
FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cos3 DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored)
WHERE rnk <= {TOP_K}
"""


def _bucket_col(e: Column, n_bits: int = N_SIGN_BITS) -> Column:
    """Deterministic LSH bucket: sign bits of the first n_bits dims
    (axis-aligned hyperplanes — a seeded random rotation would replace this
    at scale). Fewer bits = coarser buckets = higher recall. The blocked
    self-join operators (knn_self_join, dedup_embedding_cosine) use the
    occupancy-bounded adaptive-width twin in blocking.py instead."""
    bucket = F.lit(0)
    for i in range(n_bits):
        bucket = bucket + F.when(F.element_at(e, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket.cast("long")


def ann_lsh_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Bucket occupancy — the data you'd use to pick bits-per-table."""
    emb = t(spark, sf, "embeddings")
    return (
        emb.select(_bucket_col(F.col("embedding")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


_DUCK_BUCKET = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)" for i in range(N_SIGN_BITS)
)

ANN_LSH_HIST_SQL = f"""
SELECT CAST({_DUCK_BUCKET} AS BIGINT) AS bucket, COUNT(*) AS n_vectors
FROM embeddings GROUP BY 1
"""


def ann_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate top-k: search only the query's own LSH bucket.

    Scale: the bucket id is the equi-join key — the all-pairs cross join
    becomes a co-partitioned hash join; recall is traded via bits/tables.
    """
    emb = t(spark, sf, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        _bucket_col(F.col("embedding")).alias("bucket"),
    )
    # same build-side pinning as the brute-force path: queries broadcast,
    # corpus streamed (hash join on bucket)
    q = F.broadcast(emb.where(F.col("vec_id") < N_QUERIES)).alias("q")
    c = emb.alias("c")
    cos = _cos(F.col("q.e"), F.col("c.e"))
    scored = (
        q.join(c, (F.col("q.bucket") == F.col("c.bucket")) & (F.col("q.vec_id") != F.col("c.vec_id")))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            (F.floor(cos * 1000) / 1000).alias("cos3"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos3").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", "cos3")
    )


ANN_LSH_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         CAST({_DUCK_BUCKET} AS BIGINT) AS bucket
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_DUCK_COS} AS cos3
  FROM e q JOIN e c ON q.bucket = c.bucket
   AND q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, rnk, cos3
FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cos3 DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored)
WHERE rnk <= {TOP_K}
"""


N_CELLS = 16  # IVF coarse-quantizer cells
_SEED_LO, _SEED_HI = N_QUERIES, N_QUERIES + N_CELLS  # deterministic "centroids"


def ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-style approximate top-k: a coarse quantizer of N_CELLS centroid
    vectors partitions the corpus into inverted lists; each query probes
    only its own cell (nprobe=1).

    Centroids are a deterministic sample (vec_ids N_QUERIES..+N_CELLS) so
    the oracle can mirror them exactly — a trained k-means would replace
    the sample at scale, changing recall but not the dataflow. Scale shape:
    assignment is one broadcast (N_CELLS rows) streamed over the corpus;
    the candidate join is an equi-join on cell id, exactly like a real IVF
    index probe. Assignment ranks on the 3-decimal floored cosine with
    centroid id as tie-break, so cross-engine float drift cannot flip cells.
    """
    emb = t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cent = F.broadcast(
        emb.where((F.col("vec_id") >= _SEED_LO) & (F.col("vec_id") < _SEED_HI))
    ).select(F.col("vec_id").alias("cent_id"), F.col("e").alias("ce"))
    sim = F.floor(_cos(F.col("e"), F.col("ce")) * 1000) / 1000
    w_assign = W.partitionBy("vec_id").orderBy(F.col("sim3").desc(), F.col("cent_id"))
    cells = (
        emb.crossJoin(cent)
        .select("vec_id", "e", "cent_id", sim.alias("sim3"))
        .withColumn("rk", F.row_number().over(w_assign))
        .where(F.col("rk") == 1)
        .select("vec_id", "e", F.col("cent_id").alias("cell"))
    )
    q = F.broadcast(cells.where(F.col("vec_id") < N_QUERIES)).alias("q")
    c = cells.alias("c")
    cos = _cos(F.col("q.e"), F.col("c.e"))
    scored = q.join(
        c, (F.col("q.cell") == F.col("c.cell")) & (F.col("q.vec_id") != F.col("c.vec_id"))
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        (F.floor(cos * 1000) / 1000).alias("cos3"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos3").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", "cos3")
    )


_DUCK_CELL_COS = (
    "FLOOR(list_dot_product(v.emb, s.emb) / "
    "(sqrt(list_dot_product(v.emb, v.emb)) * sqrt(list_dot_product(s.emb, s.emb))) "
    "* 1000) / 1000"
)

ANN_IVF_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
cent AS (SELECT vec_id AS cent_id, emb FROM e
         WHERE vec_id >= {_SEED_LO} AND vec_id < {_SEED_HI}),
assign AS (
  SELECT vec_id, emb, cell FROM (
    SELECT v.vec_id, v.emb, s.cent_id AS cell,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {_DUCK_CELL_COS} DESC, s.cent_id) AS rk
    FROM e v CROSS JOIN cent s
  ) WHERE rk = 1
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_DUCK_COS} AS cos3
  FROM assign q JOIN assign c
    ON q.cell = c.cell AND q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, rnk, cos3
FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cos3 DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored)
WHERE rnk <= {TOP_K}
"""


N_PROBE = 2  # cells probed per query in the multi-probe variant


def ann_ivf_multiprobe(spark: SparkSession, sf: str) -> DataFrame:
    """IVF with nprobe=N_PROBE: corpus vectors live in exactly one
    inverted list (rk==1, as in a real IVF index), but each QUERY probes
    its N_PROBE nearest cells — the standard recall knob (more probes =
    more candidates = higher recall at linear candidate cost), here
    expressed as the same cell equi-join with a 2-rows-per-query probe
    relation. Since corpus assignment is unique, a neighbor can never be
    scored twice — no dedup stage needed. The probe side stays a pinned
    broadcast (2×N_QUERIES rows).
    """
    emb = t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cent = F.broadcast(
        emb.where((F.col("vec_id") >= _SEED_LO) & (F.col("vec_id") < _SEED_HI))
    ).select(F.col("vec_id").alias("cent_id"), F.col("e").alias("ce"))
    sim = F.floor(_cos(F.col("e"), F.col("ce")) * 1000) / 1000
    w_assign = W.partitionBy("vec_id").orderBy(F.col("sim3").desc(), F.col("cent_id"))
    assigned = (
        emb.crossJoin(cent)
        .select("vec_id", "e", "cent_id", sim.alias("sim3"))
        .withColumn("rk", F.row_number().over(w_assign))
    )
    cells = assigned.where(F.col("rk") == 1).select(
        "vec_id", "e", F.col("cent_id").alias("cell")
    )
    probes = assigned.where(
        (F.col("rk") <= N_PROBE) & (F.col("vec_id") < N_QUERIES)
    ).select("vec_id", "e", F.col("cent_id").alias("cell"))
    q = F.broadcast(probes).alias("q")
    c = cells.alias("c")
    cos = _cos(F.col("q.e"), F.col("c.e"))
    scored = q.join(
        c, (F.col("q.cell") == F.col("c.cell")) & (F.col("q.vec_id") != F.col("c.vec_id"))
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        (F.floor(cos * 1000) / 1000).alias("cos3"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos3").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", "cos3")
    )


ANN_IVF_MULTIPROBE_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
cent AS (SELECT vec_id AS cent_id, emb FROM e
         WHERE vec_id >= {_SEED_LO} AND vec_id < {_SEED_HI}),
assigned AS (
  SELECT v.vec_id, v.emb, s.cent_id AS cell,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
                            ORDER BY {_DUCK_CELL_COS} DESC, s.cent_id) AS rk
  FROM e v CROSS JOIN cent s
),
cells AS (SELECT vec_id, emb, cell FROM assigned WHERE rk = 1),
probes AS (SELECT vec_id, emb, cell FROM assigned
           WHERE rk <= {N_PROBE} AND vec_id < {N_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_DUCK_COS} AS cos3
  FROM probes q JOIN cells c ON q.cell = c.cell AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, rnk, cos3
FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cos3 DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored)
WHERE rnk <= {TOP_K}
"""


KNN_K = 3


def knn_self_join(spark: SparkSession, sf: str, multiprobe: bool = True) -> DataFrame:
    """SemDeDup-style self-KNN: the top-K most similar corpus vectors for
    EVERY vector (not just the external query set) — the all-pairs
    similarity graph behind semantic dedup and clustering pipelines.

    Scale shape: the all-pairs cross join (n² at 10^12 = never) becomes a
    bucket equi-join on an OCCUPANCY-BOUNDED sign bucket (blocking.py, r4:
    bits = ceil(log2(n / TARGET_OCCUPANCY)), so expected block population
    stays ~32 at any corpus size and within-block scoring is O(n x occ),
    linear in n — the r1-r3 fixed 4-bit key made it Θ(n²/16)). Recall for
    pairs straddling a sign plane is recovered the ann_ivf_multiprobe way:
    each vector's QUERY side also probes the bucket with its
    least-confident bit flipped (LSH multi-probe, Lv et al. 2007) — 2x
    candidates for measured recall@3 0.125 -> 0.237 vs exact self-KNN at
    sf0.01 (isotropic vectors, the worst case for sign planes;
    tests/test_ann_recall.py keeps the strict-dominance gate).
    The per-vector top-K window partitions on vec_id (bucket-sized
    partitions, never corpus-sized). Vectors alone in both probed buckets
    have no candidates and are absent from the output — the standard ANN
    recall trade, surfaced rather than hidden.
    """
    from .blocking import knn_probe_buckets, with_occupancy_bucket

    emb = t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cells = with_occupancy_bucket(emb)
    a = (knn_probe_buckets(cells) if multiprobe else cells).alias("a")
    b = cells.alias("b")
    cos = _cos(F.col("a.e"), F.col("b.e"))
    scored = a.join(
        b, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.vec_id") != F.col("b.vec_id"))
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("neighbor_id"),
        (F.floor(cos * 1000) / 1000).alias("cos3"),
    )
    w = W.partitionBy("vec_id").orderBy(F.col("cos3").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= KNN_K)
        .select("vec_id", "neighbor_id", "rnk", "cos3")
    )


from .blocking import (  # noqa: E402
    duck_adaptive_bucket_expr,
    duck_bits_cte,
    duck_weakest_bit_expr,
)

KNN_SELF_SQL = f"""
WITH {duck_bits_cte("embeddings")},
e AS (
  SELECT vec_id, emb2 AS emb, b,
         {duck_adaptive_bucket_expr("emb2", "b")} AS bk
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb2, nb.b AS b
        FROM embeddings, nb)
),
probes AS (
  SELECT vec_id, emb, bk FROM e
  UNION ALL
  SELECT vec_id, emb,
         xor(bk, CAST(1 AS BIGINT) << ({duck_weakest_bit_expr("emb", "b")} - 1))
  FROM e
),
scored AS (
  SELECT q.vec_id AS vec_id, c.vec_id AS neighbor_id, {_DUCK_COS} AS cos3
  FROM probes q JOIN e c ON q.bk = c.bk AND q.vec_id <> c.vec_id
)
SELECT vec_id, neighbor_id, rnk, cos3
FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
                     ORDER BY cos3 DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored)
WHERE rnk <= {KNN_K}
"""


# ---------------------------------------------------------------------------
# Product Quantization ANN (Jégou et al. 2011, public methodology) — THE
# compression technique trillion-vector ANN runs on (FAISS's IVF_PQ):
# split each vector into PQ_M subspaces, encode each subspace by its
# nearest codebook centroid (the vector becomes PQ_M small code ids),
# and score queries with an Asymmetric Distance Computation (ADC) table:
# dist(q, x) ≈ Σ_m d²(q_m, codebook[m][code_m(x)]). Memory per vector
# drops from dim×4 bytes to PQ_M bytes — at 10^12 vectors that is the
# difference between impossible and routine.
#
# Exactness recipe: vectors are integer-quantized (floor×1024, the
# clustering.py convention), so subspace distances, code assignment,
# codebook training (floor-of-double means) and the ADC sum are all
# exact int64 — cross-engine hash equality without float choreography.
#
# Training: codebooks are seeded from the quantized subvectors of
# vec_ids PQ_SEED_LO..HI and refined by ONE Lloyd round. The key
# structural point: training all PQ_M codebooks is NOT PQ_M pipelines —
# the subspace index `m` is just another grouping key, so one
# assign-argmin and one (m, cid, pos) update aggregate train every
# codebook in a single pass each (the kmeans_2iter recipe with m joined
# into every key). Measured recall@5 vs exact integer-euclidean truth at
# sf0.01: 0.575 trained vs 0.400 untrained at this geometry — and 0.025
# at the naive 4×16-dim geometry on these isotropic vectors
# (tests/test_ann_recall.py pins the floor and the trained>untrained
# dominance).
#
# Scale shape: encoding = one broadcast of PQ_M×PQ_CODES subvector
# centroids streamed over the corpus (row-local argmin per subspace);
# the ADC lookup table is Q×PQ_M×PQ_CODES rows broadcast; scoring = one
# map-side-combined SUM over the n×PQ_M×Q joined rows + a per-query
# top-K window. After encoding no stage touches full vectors — memory
# per vector drops dim×4 bytes → PQ_M code bytes, which is why
# trillion-vector indexes are PQ-compressed.

PQ_M = 16  # subspaces (64 dims -> 4 dims each; finer = lower distortion)
PQ_SUB = 4  # dims per subspace
PQ_CODES = 64  # codebook entries per subspace
PQ_ITERS = 1  # Lloyd rounds on the seeded codebooks
PQ_SEED_LO, PQ_SEED_HI = _SEED_HI, _SEED_HI + PQ_CODES  # disjoint from IVF


def _pq_sub(spark: SparkSession, sf: str) -> DataFrame:
    """(vec_id, m, s): integer-quantized subvectors, one row per
    (vector, subspace)."""
    emb = t(spark, sf, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1024).cast("long")
        ).alias("q"),
    )
    subs = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"), F.slice("q", m * PQ_SUB + 1, PQ_SUB).alias("s")
            )
            for m in range(PQ_M)
        ]
    )
    return emb.select("vec_id", F.explode(subs).alias("p")).select(
        "vec_id", "p.m", "p.s"
    )


def _pq_sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _pq_assign(sub: DataFrame, cb: DataFrame, keep_s: bool) -> DataFrame:
    """Nearest codebook entry per (vector, subspace) — a broadcast join
    on m + a row-local argmin window; ties on cid."""
    d = _pq_sqdist(F.col("s"), F.col("c")).alias("d")
    w_enc = W.partitionBy("vec_id", "m").orderBy("d", "cid")
    extra = [F.col("s")] if keep_s else []
    return (
        sub.join(F.broadcast(cb), "m")
        .select("vec_id", "m", "cid", d, *extra)
        .withColumn("rk", F.row_number().over(w_enc))
        .where(F.col("rk") == 1)
        .drop("rk", "d")
    )


def _pq_codebooks(sub: DataFrame) -> DataFrame:
    """Seed + train the PQ_M codebooks in ONE assign/update pass per
    Lloyd round (m rides in every grouping key)."""
    cb = sub.where(
        (F.col("vec_id") >= PQ_SEED_LO) & (F.col("vec_id") < PQ_SEED_HI)
    ).select("m", F.col("vec_id").alias("cid"), F.col("s").alias("c"))
    for _ in range(PQ_ITERS):
        assigned = _pq_assign(sub, cb, keep_s=True)
        dims = assigned.select("m", "cid", F.posexplode("s").alias("pos", "v"))
        newdims = dims.groupBy("m", "cid", "pos").agg(
            F.floor(F.sum("v") / F.count(F.lit(1))).cast("long").alias("cv")
        )
        newc = newdims.groupBy("m", "cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda x: x["cv"]
            ).alias("c_new")
        )
        cb = (
            cb.join(newc, ["m", "cid"], "left")
            .select("m", "cid", F.coalesce("c_new", "c").alias("c"))
            .localCheckpoint(eager=False)  # tiny (PQ_M x PQ_CODES rows)
        )
    return cb


def ann_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """PQ/ADC approximate top-k: per query, the TOP_K neighbors by the
    integer ADC distance (rank asc, ties on neighbor_id)."""
    sub = _pq_sub(spark, sf)
    cb = _pq_codebooks(sub)
    codes = _pq_assign(sub, cb, keep_s=False).select(
        "vec_id", "m", F.col("cid").alias("code")
    )
    # ADC lookup table: exact subspace distances query -> every codeword
    d = _pq_sqdist(F.col("s"), F.col("c")).alias("d")
    lut = F.broadcast(
        sub.where(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "m", "s")
        .join(F.broadcast(cb), "m")
        .select("query_id", "m", "cid", d)
    )
    scored = (
        codes.join(lut, (codes.m == lut.m) & (codes.code == lut.cid))
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d").cast("long").alias("adist"))
    )
    w = W.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", "adist")
    )


def _pq_duck_d(v: str, cb: str) -> str:
    return (
        f"CAST(list_dot_product({v}.s, {v}.s) AS BIGINT)"
        f" - 2 * CAST(list_dot_product({v}.s, {cb}.c) AS BIGINT)"
        f" + CAST(list_dot_product({cb}.c, {cb}.c) AS BIGINT)"
    )


ANN_PQ_SQL = f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS q
  FROM embeddings
),
sub AS (
  SELECT vec_id, t.m, q[t.m * {PQ_SUB} + 1 : (t.m + 1) * {PQ_SUB}] AS s
  FROM qv, (SELECT unnest([{", ".join(str(m) for m in range(PQ_M))}]) AS m) t
),
cb0 AS (
  SELECT m, vec_id AS cid, s AS c FROM sub
  WHERE vec_id >= {PQ_SEED_LO} AND vec_id < {PQ_SEED_HI}
),
a1 AS (
  SELECT vec_id, m, cid, s FROM (
    SELECT v.vec_id, v.m, cb0.cid, v.s,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.m
                              ORDER BY {_pq_duck_d("v", "cb0")}, cb0.cid) AS rk
    FROM sub v JOIN cb0 ON v.m = cb0.m) WHERE rk = 1
),
nd AS (
  SELECT m, cid, pos, CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
  FROM (SELECT m, cid, generate_subscripts(s, 1) - 1 AS pos, unnest(s) AS v FROM a1)
  GROUP BY m, cid, pos
),
cb AS (
  SELECT cb0.m, cb0.cid, COALESCE(n.c_new, cb0.c) AS c
  FROM cb0 LEFT JOIN (SELECT m, cid, list(cv ORDER BY pos) AS c_new
                      FROM nd GROUP BY m, cid) n
  ON cb0.m = n.m AND cb0.cid = n.cid
),
codes AS (
  SELECT vec_id, m, cid AS code FROM (
    SELECT v.vec_id, v.m, cb.cid,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.m
                              ORDER BY {_pq_duck_d("v", "cb")}, cb.cid) AS rk
    FROM sub v JOIN cb ON v.m = cb.m) WHERE rk = 1
),
lut AS (
  SELECT v.vec_id AS query_id, v.m, cb.cid, {_pq_duck_d("v", "cb")} AS d
  FROM sub v JOIN cb ON v.m = cb.m
  WHERE v.vec_id < {N_QUERIES}
),
scored AS (
  SELECT lut.query_id, codes.vec_id AS neighbor_id,
         CAST(SUM(lut.d) AS BIGINT) AS adist
  FROM codes JOIN lut ON codes.m = lut.m AND codes.code = lut.cid
  WHERE codes.vec_id <> lut.query_id
  GROUP BY lut.query_id, codes.vec_id
)
SELECT query_id, neighbor_id, rnk, adist
FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY adist, neighbor_id) AS BIGINT) AS rnk
      FROM scored)
WHERE rnk <= {TOP_K}
"""


QUERIES = {
    "ann_pq_topk": (ann_pq_topk, ANN_PQ_SQL),
    "ann_ivf_multiprobe": (ann_ivf_multiprobe, ANN_IVF_MULTIPROBE_SQL),
    "knn_self_join": (knn_self_join, KNN_SELF_SQL),
    "ann_topk_bruteforce": (ann_topk_bruteforce, ANN_TOPK_SQL),
    "ann_lsh_histogram": (ann_lsh_histogram, ANN_LSH_HIST_SQL),
    "ann_lsh_topk": (ann_lsh_topk, ANN_LSH_TOPK_SQL),
    "ann_ivf_topk": (ann_ivf_topk, ANN_IVF_TOPK_SQL),
}
