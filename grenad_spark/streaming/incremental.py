"""Incremental index build via Structured Streaming.

grenad's Sorter accepts inserts in arbitrary order and spills sorted chunks;
its Merger later folds chunks into one file (src/sorter.rs:478-498, :576-634).
The streaming analog: each micro-batch of newly crawled docs becomes one
GENERATION index (a sorted immutable run) via foreachBatch; `compact_indexes`
plays the Merger whenever the generation count reaches max_generations
(grenad max_nb_chunks = 25, src/sorter.rs:21).

Exactly-once: foreachBatch + the streaming checkpoint give at-least-once with
idempotent generation dirs (gen id = batch epoch; a replayed epoch overwrites
its own directory — same bytes, deterministic build).

Query over a non-compacted multi-generation index: union the generations'
segments with newest-wins doc resolution at decode time; v1 requires
compaction before serving (documented contract), matching grenad where reads
go through a finished file.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from grenad_spark.index.build import build_index
from grenad_spark.index.compact import MAX_GENERATIONS, compact_indexes

DOCS_SCHEMA = "doc_id long, text string"


def generation_paths(index_root: str) -> list[str]:
    # (epoch, name) key: a compacted run `gen={e}_c` must sort AFTER the raw
    # `gen={e}` it subsumes (newest-wins doc resolution), and the tie-break
    # must not depend on os.listdir order
    gens = sorted(
        (d for d in os.listdir(index_root) if d.startswith("gen=")),
        key=lambda d: (int(d.split("=")[1].split("_")[0]), d),
    ) if os.path.isdir(index_root) else []
    return [os.path.join(index_root, d) for d in gens]


def incremental_index_stream(
    spark: SparkSession,
    docs_stream_dir: str,
    index_root: str,
    checkpoint_dir: str,
    n_shards: int = 4,
    max_generations: int = MAX_GENERATIONS,
    with_positions: bool = False,
    fielded_positions: bool = False,
):
    """Start (availableNow) a stream that turns each micro-batch of docs into
    a generation index; auto-compacts when generations pile up. Returns the
    StreamingQuery (caller awaits termination).

    with_positions: each generation also gets its positional table
    (index/positions.py), so phrase/proximity serving works over the live
    generation set (search_topk_phrase_fresh) and through auto-compaction
    (compact_indexes merges positions whenever every input generation
    carries them).

    fielded_positions (implies with_positions): generations get FIELD-AWARE
    positions over the canonical title/body split (corpus.fielded_docs), so
    attribute/exactness serving works on the compacted result; compaction
    propagates position_fields when every generation agrees."""
    os.makedirs(index_root, exist_ok=True)

    live_dir = os.path.join(index_root, "_live")

    def _refresh_live(spark_, new_gen: str | None) -> None:
        """Maintain the persisted live map (index/live.py) at delta-build
        time. Adding one generation folds it in incrementally (work ∝ delta
        + map) — but ONLY when the existing map's generation set matches the
        on-disk one minus the new generation; any mismatch (first batch,
        post-compaction, or a crash that left a stale map behind) recomputes
        from the current generation set, so the map is SELF-HEALING rather
        than perpetually stale. Swap is rename-based; a crash window without
        a map is benign — search_topk_fresh falls back to the inline
        derivation when live_dir is absent."""
        import json as _json
        import shutil

        from grenad_spark.index.live import update_live_map, write_live_map

        gens_now = generation_paths(index_root)
        incremental = False
        if new_gen is not None and os.path.isdir(live_dir):
            try:
                with open(os.path.join(live_dir, "stats.json")) as fh:
                    have = set(_json.load(fh)["gen_names"])
                want_prev = {os.path.basename(g) for g in gens_now} - {
                    os.path.basename(new_gen)
                }
                incremental = have == want_prev
            except (OSError, KeyError, ValueError):
                incremental = False  # unreadable map: recompute
        tmp = live_dir + "_next"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if incremental:
            update_live_map(spark_, live_dir, new_gen, tmp)
        else:
            write_live_map(spark_, gens_now, tmp)
        old = live_dir + "_old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.isdir(live_dir):
            os.rename(live_dir, old)
        os.rename(tmp, live_dir)
        if os.path.exists(old):
            shutil.rmtree(old)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = os.path.join(index_root, f"gen={epoch_id}")
        build_index(
            batch_df.sparkSession, batch_df, out, n_shards=n_shards, overwrite=True
        )
        if with_positions or fielded_positions:
            from grenad_spark.index.positions import build_positions

            if fielded_positions:
                from grenad_spark.corpus import fielded_docs

                build_positions(
                    batch_df.sparkSession, fielded_docs(batch_df), out,
                    fields=["title", "body"],
                )
            else:
                build_positions(batch_df.sparkSession, batch_df, out)
        gens = generation_paths(index_root)
        if len(gens) < max_generations:
            # not compacting this batch: fold the new generation in now.
            # (When compacting, skip this — the map would be rewritten for
            # the collapsed generation set seconds later anyway.)
            _refresh_live(batch_df.sparkSession, out)
        if len(gens) >= max_generations:
            import shutil

            compacted_tmp = os.path.join(index_root, "_compacting")
            # clear any leftovers of a CRASHED earlier compaction: stage
            # _SUCCESS markers in a half-written scratch dir would otherwise
            # let the new compaction resume/skip stages against a different
            # generation set
            shutil.rmtree(compacted_tmp, ignore_errors=True)
            compact_indexes(batch_df.sparkSession, gens, compacted_tmp)
            # CRASH-SAFE swap order: rename the compacted run INTO place
            # FIRST (readers see either the old generations, or old + the
            # compacted run that supersedes them — newest-wins makes both
            # servable and equivalent), THEN delete the old generations. The
            # previous delete-then-rename order could crash in between and
            # leave only `_compacting`, which generation_paths() won't list —
            # the index would read as empty even though the data exists.
            os.rename(compacted_tmp, os.path.join(index_root, f"gen={epoch_id}_c"))
            for g in gens:
                shutil.rmtree(g)
            _refresh_live(batch_df.sparkSession, None)  # new generation set

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_stream_dir)
    )
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
