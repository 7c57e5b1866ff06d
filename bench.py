"""Benchmark harness (driver-run per round; BENCH_r{N}.json).

Measures, at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1):
1. index-build throughput (docs/sec) on a deterministic ×REPL replicated
   corpus, at local[8] and local[32] → scaling efficiency
   throughput(32) / (4 × throughput(8))  — the sandbox stand-in for the
   north_rule's N vs 4N executor scaling (BASELINE.md metric 3, ≥0.8).
2. BM25 top-k p50/p95 latency over the reference query set, WAND and
   exhaustive, on the local[32] index.

Prints ONE JSON line: {"metric", "value" (total suite sec), "unit": "sec",
"queries": {...per-phase/per-query sec...}, "sf", plus scaling fields}.
All progress goes to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPL = int(os.environ.get("SPARK_GRAFT_BENCH_REPL", "16"))
LOW_CPUS = 8
HIGH_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def replicated_docs(spark, sf_dir: str, repl: int):
    """Deterministic ×repl corpus: copy i shifts doc_id by i·n_docs."""
    from pyspark.sql import functions as F

    from grenad_spark.corpus import load_documents

    docs = load_documents(spark, sf_dir).select("doc_id", "text")
    n = docs.count()
    copies = spark.range(repl).select(F.col("id").alias("copy"))
    return (
        docs.crossJoin(F.broadcast(copies))
        .select((F.col("doc_id") + F.col("copy") * n).alias("doc_id"), "text"),
        n * repl,
    )


def timed_build(cpus: int, out_dir: str) -> tuple[float, int]:
    """Fresh session at local[cpus]; returns (seconds, n_docs)."""
    from grenad_spark.index.build import build_index
    from grenad_spark.session import get_spark, stop_spark

    stop_spark()
    spark = get_spark(f"bench-build-{cpus}", cpus=cpus, shuffle_partitions=cpus * 2)
    docs, n_docs = replicated_docs(spark, SF_DIR, REPL)
    docs = docs.cache()
    docs.count()  # materialize input outside the timed window
    t0 = time.time()
    build_index(
        spark,
        docs,
        out_dir,
        overwrite=True,
        partitions=cpus * 2,
        docs_per_shard=max(5000, n_docs // (cpus * 2)),
    )
    dt = time.time() - t0
    docs.unpersist()
    return dt, n_docs


def main() -> None:
    t_suite = time.time()
    queries: dict[str, float] = {}

    log(f"bench: sf_dir={SF_DIR} repl={REPL}")
    t8, n_docs = timed_build(LOW_CPUS, "/tmp/bench_idx8")
    queries[f"build_local{LOW_CPUS}"] = round(t8, 3)
    log(f"build local[{LOW_CPUS}]: {t8:.1f}s ({n_docs / t8:.0f} docs/s)")

    t32, _ = timed_build(HIGH_CPUS, "/tmp/bench_idx32")
    queries[f"build_local{HIGH_CPUS}"] = round(t32, 3)
    log(f"build local[{HIGH_CPUS}]: {t32:.1f}s ({n_docs / t32:.0f} docs/s)")

    ratio = HIGH_CPUS / LOW_CPUS
    efficiency = (n_docs / t32) / (ratio * (n_docs / t8))
    log(f"scaling efficiency ({LOW_CPUS}->{HIGH_CPUS}): {efficiency:.3f}")

    # query latency on the local[32] index (session already at HIGH_CPUS)
    from pyspark.sql import SparkSession

    from grenad_spark.index.build import IndexHandle
    from grenad_spark.query.bm25 import REFERENCE_QUERIES
    from grenad_spark.query.search import search_topk

    spark = SparkSession.getActiveSession()
    idx = IndexHandle("/tmp/bench_idx32")
    lat: dict[str, list[float]] = {"wand": [], "exhaustive": []}
    for mode in ("wand", "exhaustive"):
        # warm-up (JIT, file listing, broadcast)
        search_topk(spark, idx, REFERENCE_QUERIES[:1], k=10, mode=mode).collect()
        for qid, q in REFERENCE_QUERIES:
            t0 = time.time()
            search_topk(spark, idx, [(qid, q)], k=10, mode=mode).collect()
            dt = time.time() - t0
            lat[mode].append(dt)
            queries[f"{mode}_q{qid}"] = round(dt, 3)
    p50w = statistics.median(lat["wand"])
    p50e = statistics.median(lat["exhaustive"])
    log(f"query p50: wand={p50w:.3f}s exhaustive={p50e:.3f}s")

    total = time.time() - t_suite
    result = {
        "metric": "index_build_plus_bm25_suite_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "n_docs_indexed": n_docs,
        "build_docs_per_sec_low": round(n_docs / t8, 1),
        "build_docs_per_sec_high": round(n_docs / t32, 1),
        "scaling_efficiency": round(efficiency, 3),
        "scaling_levels": [LOW_CPUS, HIGH_CPUS],
        "bm25_p50_sec_wand": round(p50w, 3),
        "bm25_p50_sec_exhaustive": round(p50e, 3),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
