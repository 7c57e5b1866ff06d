"""Live-map side table for the LSM read path (search_topk_fresh).

Fresh search over unmerged generations needs two things per query batch:
the doc → newest-generation map (tombstone resolution — grenad MergerIter's
newest-wins, src/merger.rs:51-57, resolved at doc granularity) and the live
corpus stats (n_docs, avgdl). Deriving them per query re-aggregates EVERY
generation's membership table — a corpus-membership-sized shuffle per batch
at a 10^10-doc corpus. They only change when a generation is added or
removed, so they are maintained as a persisted side table at delta-BUILD
time instead:

  write_live_map   — compute the map for a generation set (one doc-keyed
                     aggregate, run once per set change)
  update_live_map  — fold ONE new generation into an existing map
                     (work ∝ |delta| + |map|, no re-aggregation of older
                     generations — the streaming builder's per-batch path)

Layout: <dir>/live_docs/ parquet (doc_id, dl, gen_name) + <dir>/stats.json
{n_docs, avgdl, gen_names}. gen_name is the generation directory BASENAME —
stable across list reorderings and compaction renames, unlike a positional
ordinal; readers map names to their own handle positions and refuse a stale
map whose generation set doesn't match theirs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _gen_name(path: str) -> str:
    return os.path.basename(os.path.normpath(path))


def _write(spark: SparkSession, live: DataFrame, gen_names: list[str], out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    live.write.mode("overwrite").parquet(os.path.join(out_dir, "live_docs"))
    st = (
        spark.read.parquet(os.path.join(out_dir, "live_docs"))
        .agg(F.count("*").cast("long").alias("n"), F.avg("dl").alias("a"))
        .first()
    )
    with open(os.path.join(out_dir, "stats.json"), "w") as fh:
        json.dump(
            {
                "n_docs": int(st["n"]),
                "avgdl": float(st["a"]) if st["a"] is not None else 0.0,
                "gen_names": sorted(gen_names),
            },
            fh,
            indent=1,
        )


def write_live_map(spark: SparkSession, index_paths: list[str], out_dir: str) -> None:
    """Compute doc → (dl, newest generation) over a generation set (ordered
    oldest → newest, the merge-source order) and persist it with live stats.
    ONE doc-keyed aggregate — the shuffle the query path no longer pays."""
    from grenad_spark.index.build import IndexHandle

    union = None
    for i, p in enumerate(index_paths):
        d = (
            IndexHandle(p)
            .docs(spark)
            .select(
                "doc_id",
                F.struct(
                    F.lit(i).alias("ord"),
                    F.col("dl").alias("dl"),
                    F.lit(_gen_name(p)).alias("gen_name"),
                ).alias("m"),
            )
        )
        union = d if union is None else union.unionByName(d)
    # max of (ord, dl, gen_name) structs == newest generation's row per doc
    # (ord is unique per doc within the union: doc_id is unique per gen)
    live = (
        union.groupBy("doc_id")
        .agg(F.max("m").alias("m"))
        .select("doc_id", F.col("m.dl").alias("dl"), F.col("m.gen_name").alias("gen_name"))
    )
    _write(spark, live, [_gen_name(p) for p in index_paths], out_dir)


def update_live_map(
    spark: SparkSession, live_dir: str, new_index_path: str, out_dir: str
) -> None:
    """Fold one NEW (newest) generation into an existing live map: the new
    generation's docs win; surviving older entries pass through via an
    anti-join. Work ∝ |delta| + |map| — older generations are never re-read."""
    from grenad_spark.index.build import IndexHandle

    with open(os.path.join(live_dir, "stats.json")) as fh:
        prev_stats = json.load(fh)
    prev = spark.read.parquet(os.path.join(live_dir, "live_docs"))
    name = _gen_name(new_index_path)
    nd = (
        IndexHandle(new_index_path)
        .docs(spark)
        .select("doc_id", "dl", F.lit(name).alias("gen_name"))
    )
    merged = prev.join(nd.select("doc_id"), "doc_id", "left_anti").unionByName(nd)
    _write(spark, merged, sorted(set(prev_stats["gen_names"]) | {name}), out_dir)


def read_live_map(
    spark: SparkSession, live_dir: str, index_paths: list[str]
) -> tuple[DataFrame, float, float]:
    """(live df with doc_id → live_gen ORDINAL matching index_paths order,
    n_docs, avgdl). Refuses a map whose generation set differs from the
    caller's (a stale map would silently resurrect tombstoned docs)."""
    # partial-write guard: _write overwrites live_docs/ (directory delete +
    # rewrite — a multi-second window, NOT an atomic rename). A reader that
    # lands mid-write would otherwise get a silently PARTIAL map, and the
    # serving join would drop postings of docs missing from it — wrong
    # results with no error. _SUCCESS is committed last, so its absence is
    # the reliable in-progress signal; raising here routes the caller onto
    # its inline-derivation fallback.
    if not os.path.exists(os.path.join(live_dir, "live_docs", "_SUCCESS")):
        raise FileNotFoundError(
            f"live map at {live_dir} is missing live_docs/_SUCCESS — "
            f"absent or mid-rewrite"
        )
    with open(os.path.join(live_dir, "stats.json")) as fh:
        stats = json.load(fh)
    names = [_gen_name(p) for p in index_paths]
    if len(set(names)) != len(names):
        raise ValueError(
            f"generation basenames must be unique (map keys): {names} — "
            f"two generations from different parents share a name"
        )
    if sorted(names) != stats["gen_names"]:
        raise ValueError(
            f"live map at {live_dir} covers generations {stats['gen_names']}, "
            f"caller has {sorted(names)} — rebuild with write_live_map"
        )
    pairs = []
    for i, n in enumerate(names):
        pairs.extend([F.lit(n), F.lit(i)])
    live = spark.read.parquet(os.path.join(live_dir, "live_docs")).select(
        "doc_id", F.create_map(*pairs)[F.col("gen_name")].alias("live_gen")
    )
    return live, float(stats["n_docs"]), float(stats["avgdl"])
