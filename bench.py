#!/usr/bin/env python3
"""Benchmark harness.

Default: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "docs_per_sec": ..., "n_docs": ...}

--scaling: run the flagship extraction at two parallelism levels (N=8,
4N=32 threads — the sandbox stand-in for N vs 4N executors, same input,
same artifact) in fresh subprocesses and report throughput at both plus
scaling efficiency eff = (T_N / T_4N) / 4. Results land in BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "extract_merged",
    "extract_like_search",
    "q1_pricing_summary",
    "q3_top_revenue",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "ann_topk_bruteforce",
    "ann_lsh_topk",
    "token_count",
    "doc_fingerprint",
]


def _sf_of(sf_dir: str) -> float:
    tail = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    try:
        return float(tail.replace("sf", ""))
    except ValueError:
        return -1.0


def _materialize(df) -> int:
    """Force full computation of every column (noop sink, no driver collect)."""
    df.write.mode("overwrite").format("noop").save()
    return 0


def run_bench(cores: int, sf_dir: str, names: list[str]) -> dict:
    from ocr_suite_spark import datagen
    from ocr_suite_spark.queries import REGISTRY
    from ocr_suite_spark.session import get_spark

    spark = get_spark(
        cores=cores,
        app="ocs-bench",
        shuffle_partitions=cores,
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    # warmup: JVM + python workers + parquet footer reads
    spark.range(1000).selectExpr("sum(id)").collect()
    docs = datagen.interleaved_from_documents(spark, sf_dir)
    n_docs = docs.count()

    per_query: dict[str, float] = {}
    for name in names:
        fn, _ = REGISTRY[name]
        # warm run (python worker pool, codegen, shuffle files), then the
        # timed steady-state run — executors are long-lived on a real cluster
        _materialize(fn(spark, sf_dir))
        t0 = time.time()
        _materialize(fn(spark, sf_dir))
        per_query[name] = round(time.time() - t0, 3)

    flagship = per_query.get("extract_merged")
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "sf": _sf_of(sf_dir),
        "cores": cores,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / flagship, 2) if flagship else None,
    }
    spark.stop()
    return out


def run_flagship_once(cores: int, n_docs: int) -> dict:
    """Steady-state extraction throughput over a materialized synthetic
    corpus of n_docs interleaved documents (fresh JVM)."""
    from ocr_suite_spark import datagen
    from ocr_suite_spark.operators import extract as X
    from ocr_suite_spark.session import get_spark

    spark = get_spark(
        cores=cores,
        app=f"ocs-scaling-{cores}",
        shuffle_partitions=cores,
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    docs = datagen.materialized_corpus(spark, "", n_synth=n_docs)
    n = docs.count()
    _materialize(X.extract(docs))  # warm: worker pool, codegen, shuffle
    walls = []
    for _ in range(2 if n_docs >= 48000 else 4):  # min-of-k: multi-second VM noise
        t0 = time.time()
        _materialize(X.extract(docs))
        walls.append(time.time() - t0)
    wall = min(walls)
    spark.stop()
    return {
        "wall": round(wall, 3),
        "walls": [round(w, 3) for w in walls],
        "n_docs": n,
        "docs_per_sec": round(n / wall, 2),
    }


def run_scaling(n_docs: int = 20000, n: int = 6, n4: int = 24) -> dict:
    """Same job (extract), same materialized input, two parallelism levels,
    fresh JVM each — the sandbox stand-in for N vs 4N executors.

    6 vs 24 (not 8 vs 32): the 4N level must leave cores for the JVM's own
    scheduler/shuffle/Arrow threads, exactly as a real executor leaves cores
    for its daemon threads — local[32] on a 32-core box oversubscribes and
    penalizes the 4N measurement with an artifact a real cluster doesn't have.
    """
    results = {}
    for cores in (n, n4):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
        out = subprocess.run(
            [sys.executable, __file__, "--flagship-once", str(n_docs)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        results[cores] = json.loads(out.stdout.strip().splitlines()[-1])
    t_n, t_4n = results[n]["wall"], results[n4]["wall"]
    return {
        "metric": "scaling_efficiency_n_to_4n",
        "value": round((t_n / t_4n) / (n4 / n), 3),
        "unit": "ratio",
        "n_docs": n_docs,
        "t_n_sec": t_n,
        "t_4n_sec": t_4n,
        "cores_n": n,
        "cores_4n": n4,
        "docs_per_sec_n": results[n]["docs_per_sec"],
        "docs_per_sec_4n": results[n4]["docs_per_sec"],
    }


if __name__ == "__main__":
    args = sys.argv[1:]
    if "--scaling" in args:
        n_docs = int(args[args.index("--scaling") + 1]) if args.index("--scaling") + 1 < len(args) and args[args.index("--scaling") + 1].isdigit() else 20000
        print(json.dumps(run_scaling(n_docs)))
    elif "--flagship-once" in args:
        n_docs = int(args[args.index("--flagship-once") + 1])
        print(json.dumps(run_flagship_once(CPUS, n_docs)))
    else:
        names = HEADLINE
        if "--only" in args:
            names = [args[args.index("--only") + 1]]
        print(json.dumps(run_bench(CPUS, SF_DIR, names)))
