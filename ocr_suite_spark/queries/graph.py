"""Link-graph operators over the document corpus.

A web-scale corpus is also a web GRAPH, and the single most-run batch
computation over that graph is PageRank. The corpus tables carry no link
column, so the edge list is SYNTHESIZED deterministically from doc_id:
each node u emits 2-3 targets through quasi-random quadratic hash maps
(((u % p1) * (u % p2) + a*u + b) % N with distinct prime pairs per map;
products stay < 1e10 so the arithmetic is overflow-safe int64 at ANY
corpus size), duplicates dropped. Affine maps (2u+1 etc.) would give
every node identical in-degree modulo parity — no rank variation to
grade; the quadratic maps give a skewed in-degree distribution like a
real link graph. Both engines derive the identical graph from the same
rows, so the oracle grades the ITERATION, not the synthesis. With a real
crawl the synthesis is replaced by an extracted outlink column (see
webextract.py's html queries).

Determinism across engines: PageRank is usually float math, and parallel
float summation is fold-order-dependent — exactly what the driver's
value-hash compare cannot tolerate. So ranks are FIXED-POINT integers
(scale K = 1e9): rank0 = K // N, each iteration's contribution is
(85 * rank) DIV (100 * deg) with integer division, and the damping base
is (15 * K) DIV (100 * N). Every operation is exact 64-bit integer
arithmetic, so any fold order and any partitioning give bit-identical
ranks. 85*K fits comfortably in int64.

Scale shape (per iteration): one equi-join of the edge list with the
rank vector on src and one groupBy on dst — the standard distributed
PageRank stages. Iteration count is fixed (2), so lineage stays shallow
(no checkpoint needed); at a real 10^12-edge scale each iteration is two
shuffles, both keyed, both AQE-sizeable, and the rank vector stays
(id, long) narrow. The one driver-side action is a scalar count(N) used
as a literal — the same pattern as the IVF centroid constant.

Reference tie-in: the reference has no graph op (it is a single-corpus
OCR tool); this extends the engine along the training-data-pipeline axis
(link-based quality priors for crawl curation are public practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import t

K = 10**9  # fixed-point scale for ranks
_D_NUM, _D_DEN = 85, 100  # damping 0.85 as a ratio
_ITERS = 2


# (p1, p2, a, b) per target map; map 3 fires on even u only (out-deg 2 or 3)
_MAPS = [
    (100003, 99991, 3, 1),
    (31337, 31357, 7, 2),
    (7919, 7907, 11, 5),
]


def _target_array(u, n_docs: int):
    """The 2-3 quasi-random link targets of node `u` as a Column expr —
    the single source of truth for the synthesized graph. `_edges`,
    `html_outlinks` and (via `_duck_targets`) every SQL mirror derive from
    this one definition, so an edit here cannot silently diverge them
    (ADVICE r3: html_outlinks used to re-derive the maps inline)."""

    def tgt(p1, p2, a, b):
        return ((u % p1) * (u % p2) + a * u + b) % n_docs

    raw = F.array(
        tgt(*_MAPS[0]),
        tgt(*_MAPS[1]),
        F.when(u % 2 == 0, tgt(*_MAPS[2])),
    )
    return F.array_distinct(F.filter(raw, lambda x: x.isNotNull()))


def _duck_targets(id_sql: str = "id", n_sql: str = "n") -> str:
    """DuckDB fragment for the same target list (shared by PAGERANK_SQL,
    OUTLINKS_SQL and _duck_edge_list)."""
    def tgt(p1, p2, a, b):
        return (
            f"(({id_sql} % {p1}) * ({id_sql} % {p2})"
            f" + {a} * {id_sql} + {b}) % {n_sql}"
        )

    return (
        "list_distinct(list_filter(["
        f"\n      {tgt(*_MAPS[0])},"
        f"\n      {tgt(*_MAPS[1])},"
        f"\n      CASE WHEN {id_sql} % 2 = 0 THEN\n        {tgt(*_MAPS[2])}\n      ELSE NULL END"
        "\n    ], x -> x IS NOT NULL))"
    )


def _edges(docs: DataFrame, n_docs: int) -> DataFrame:
    u = F.col("doc_id").cast("long")
    return docs.select(u.alias("src"), F.explode(_target_array(u, n_docs)).alias("dst"))


def pagerank_2iter(spark: SparkSession, sf: str) -> DataFrame:
    """Two fixed-point PageRank iterations over the synthetic link graph:
    per node the final rank (scale K), out-degree and in-degree."""
    docs = t(spark, sf, "documents").select("doc_id")
    n_docs = docs.count()  # scalar literal, not a per-row collect
    edges = _edges(docs, n_docs)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    nodes = docs.select(F.col("doc_id").cast("long").alias("id"))
    base = (15 * K) // (100 * n_docs)
    r = nodes.select("id", F.lit(K // n_docs).cast("long").alias("rank"))
    for _ in range(_ITERS):
        contrib = (
            edges.join(r, edges.src == r["id"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("to_id"),
                # Spark DIV truncates toward zero, DuckDB // floors; they
                # agree here because rank and deg are nonnegative by
                # construction (same pitfall note as clustering.py)
                F.expr(f"({_D_NUM} * rank) DIV ({_D_DEN} * deg)").alias("c"),
            )
        )
        sums = contrib.groupBy("to_id").agg(F.sum("c").cast("long").alias("s"))
        r = nodes.join(sums, nodes.id == F.col("to_id"), "left").select(
            "id",
            (F.lit(base) + F.coalesce(F.col("s"), F.lit(0)))
            .cast("long")
            .alias("rank"),
        )
    in_deg = edges.groupBy("dst").agg(F.count(F.lit(1)).cast("long").alias("in_deg"))
    return (
        r.join(deg, r.id == deg.src, "left")
        .join(in_deg, r.id == in_deg.dst, "left")
        .select(
            F.col("id").alias("doc_id"),
            "rank",
            F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce(F.col("in_deg"), F.lit(0)).cast("long").alias("in_deg"),
        )
    )


PAGERANK_SQL = f"""
WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
nodes AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
edges AS (
  SELECT id AS src,
         unnest({_duck_targets()}) AS dst
  FROM nodes CROSS JOIN nn
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
r0 AS (SELECT id, CAST({K} // n AS BIGINT) AS rank FROM nodes CROSS JOIN nn),
c1 AS (
  SELECT e.dst AS id, CAST(SUM(({_D_NUM} * r.rank) // ({_D_DEN} * d.deg)) AS BIGINT) AS s
  FROM edges e JOIN r0 r ON e.src = r.id JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r1 AS (
  SELECT n2.id, CAST({15 * K} // (100 * nn.n) + COALESCE(c1.s, 0) AS BIGINT) AS rank
  FROM nodes n2 CROSS JOIN nn LEFT JOIN c1 ON n2.id = c1.id
),
c2 AS (
  SELECT e.dst AS id, CAST(SUM(({_D_NUM} * r.rank) // ({_D_DEN} * d.deg)) AS BIGINT) AS s
  FROM edges e JOIN r1 r ON e.src = r.id JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r2 AS (
  SELECT n2.id, CAST({15 * K} // (100 * nn.n) + COALESCE(c2.s, 0) AS BIGINT) AS rank
  FROM nodes n2 CROSS JOIN nn LEFT JOIN c2 ON n2.id = c2.id
),
indeg AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS in_deg FROM edges GROUP BY dst)
SELECT r2.id AS doc_id, r2.rank,
       CAST(COALESCE(deg.deg, 0) AS BIGINT) AS out_deg,
       CAST(COALESCE(indeg.in_deg, 0) AS BIGINT) AS in_deg
FROM r2 LEFT JOIN deg ON r2.id = deg.src LEFT JOIN indeg ON r2.id = indeg.dst
"""


# ---------------------------------------------------------------------------
# Outlink extraction — the missing first stage of the graph pipeline above.
# A real crawl gets its edge list by EXTRACTING hrefs from stored markup;
# here the markup is synthesized per doc (same convention as webextract.py:
# both engines build byte-identical HTML from the same rows) carrying one
# host anchor plus one doc:// anchor per link target, and the registered
# query is the EXTRACTION: regexp_extract_all over the href attribute,
# parse, explode. Its output schema (src, dst) is exactly the edge list
# pagerank_2iter iterates over — test_graph_ops asserts the extracted
# edges equal the synthesized graph, so extraction → PageRank composes
# with no adapter.
#
# Scale: row-local regex (codegen'd, no UDF) + one explode; zero shuffles
# until a consumer aggregates. The href regex never backtracks
# (single character class), so cost is linear in markup bytes.


def html_outlinks(spark: SparkSession, sf: str) -> DataFrame:
    """Per document: the outgoing link targets extracted from (synthetic)
    markup — (src, dst, host) rows, dst parsed from doc:// anchors."""
    docs = t(spark, sf, "documents").select("doc_id", "source")
    n_docs = docs.count()  # scalar literal (same as pagerank_2iter)
    u = F.col("doc_id").cast("long")
    anchors = F.transform(
        _target_array(u, n_docs),  # shared derivation — see _target_array
        lambda d: F.concat(
            F.lit('<a href="doc://'), d.cast("string"), F.lit('">link</a>')
        ),
    )
    html = F.concat(
        F.lit('<html><body><a href="https://'),
        F.col("source"),
        F.lit('.example.com/">home</a><p>'),
        F.array_join(anchors, " "),
        F.lit("</p></body></html>"),
    )
    extracted = docs.select(
        u.alias("src"),
        F.regexp_extract(html, 'href="https://([^"]*)"', 1).alias("host"),
        F.explode(
            F.regexp_extract_all(html, F.lit('href="doc://([0-9]+)"'), 1)
        ).alias("dst_s"),
    )
    return extracted.select(
        "src", F.col("dst_s").cast("long").alias("dst"), "host"
    )


OUTLINKS_SQL = f"""
WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
ids AS (SELECT CAST(doc_id AS BIGINT) AS id, source FROM documents),
pages AS (
  SELECT id, source,
    '<html><body><a href="https://' || source || '.example.com/">home</a><p>' ||
    array_to_string(list_transform({_duck_targets()},
      d -> '<a href="doc://' || d || '">link</a>'), ' ') ||
    '</p></body></html>' AS html
  FROM ids CROSS JOIN nn
)
SELECT id AS src,
       CAST(unnest(regexp_extract_all(html, 'href="doc://([0-9]+)"', 1)) AS BIGINT) AS dst,
       regexp_extract(html, 'href="https://([^"]*)"', 1) AS host
FROM pages
"""


# ---------------------------------------------------------------------------
# HITS hubs/authorities — the other classical link-analysis ranking
# (Kleinberg 1999). Two UNNORMALIZED power iterations: a(v) = Σ h(u) over
# in-edges, h(u) = Σ a(v) over out-edges, h0 = 1. Skipping the usual L2
# normalization keeps every operation an exact integer sum — and changes
# nothing that matters: each normalization divides ALL scores by one
# global constant, so after any fixed number of iterations the
# unnormalized scores are the normalized ones times a known scalar —
# identical ranking, exact cross-engine equality. int64 safety, stated in
# terms of IN-degree (the authority update sums over in-edges and the
# synthesized graph is deliberately in-degree-skewed, so out-degree ≤ 3
# alone does not bound it): with Din = max in-degree, a1 ≤ Din,
# h1 ≤ 3·Din, a2 ≤ Din·3·Din = 3·Din², h2 ≤ 9·Din². The 3-map synthesis
# keeps Din near-logarithmic in N; even a pathological Din = 10^6 gives
# 9·10^12, nowhere near int64.
#
# Scale shape: identical to pagerank_2iter — per half-iteration one
# edges⋈scores equi-join and one groupBy on the opposite endpoint.


def hits_2iter(spark: SparkSession, sf: str) -> DataFrame:
    """Per node: unnormalized hub and authority scores after two HITS
    rounds over the synthetic link graph (ranking-equivalent to the
    normalized scores; see module comment)."""
    docs = t(spark, sf, "documents").select("doc_id")
    n_docs = docs.count()
    edges = _edges(docs, n_docs)
    nodes = docs.select(F.col("doc_id").cast("long").alias("id"))
    h = nodes.select("id", F.lit(1).cast("long").alias("h"))
    a = None
    for _ in range(_ITERS):
        a_sums = (
            edges.join(h, edges.src == h["id"])
            .groupBy("dst")
            .agg(F.sum("h").cast("long").alias("s"))
        )
        a = nodes.join(a_sums, nodes.id == F.col("dst"), "left").select(
            "id", F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("a")
        )
        h_sums = (
            edges.join(a, edges.dst == a["id"])
            .groupBy("src")
            .agg(F.sum("a").cast("long").alias("s"))
        )
        h = nodes.join(h_sums, nodes.id == F.col("src"), "left").select(
            "id", F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("h")
        )
    return (
        h.join(a, "id")
        .select(F.col("id").alias("doc_id"), F.col("h").alias("hub"), F.col("a").alias("auth"))
    )


def _duck_edge_list() -> str:
    return f"""
  SELECT id AS src,
         unnest({_duck_targets()}) AS dst
  FROM nodes CROSS JOIN nn"""


HITS_SQL = f"""
WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
nodes AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
edges AS ({_duck_edge_list()}),
h0 AS (SELECT id, CAST(1 AS BIGINT) AS h FROM nodes),
a1 AS (
  SELECT n2.id, CAST(COALESCE(s.s, 0) AS BIGINT) AS a
  FROM nodes n2 LEFT JOIN (
    SELECT e.dst AS id, SUM(h.h) AS s FROM edges e JOIN h0 h ON e.src = h.id GROUP BY e.dst
  ) s ON n2.id = s.id
),
h1 AS (
  SELECT n2.id, CAST(COALESCE(s.s, 0) AS BIGINT) AS h
  FROM nodes n2 LEFT JOIN (
    SELECT e.src AS id, SUM(a.a) AS s FROM edges e JOIN a1 a ON e.dst = a.id GROUP BY e.src
  ) s ON n2.id = s.id
),
a2 AS (
  SELECT n2.id, CAST(COALESCE(s.s, 0) AS BIGINT) AS a
  FROM nodes n2 LEFT JOIN (
    SELECT e.dst AS id, SUM(h.h) AS s FROM edges e JOIN h1 h ON e.src = h.id GROUP BY e.dst
  ) s ON n2.id = s.id
),
h2 AS (
  SELECT n2.id, CAST(COALESCE(s.s, 0) AS BIGINT) AS h
  FROM nodes n2 LEFT JOIN (
    SELECT e.src AS id, SUM(a.a) AS s FROM edges e JOIN a2 a ON e.dst = a.id GROUP BY e.src
  ) s ON n2.id = s.id
)
SELECT h2.id AS doc_id, h2.h AS hub, a2.a AS auth
FROM h2 JOIN a2 ON h2.id = a2.id
"""


QUERIES = {
    "pagerank_2iter": (pagerank_2iter, PAGERANK_SQL),
    "html_outlinks": (html_outlinks, OUTLINKS_SQL),
    "hits_2iter": (hits_2iter, HITS_SQL),
}
