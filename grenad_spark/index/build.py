"""Index build — grenad's Sorter/Writer pipeline as a Spark job.

Pipeline (reference trace src/sorter.rs:478-498 insert → :509-574 write_chunk
→ :576-634 merge_chunks → src/writer.rs:164-297 Writer):

  documents (doc_id, text)                     [scan: all other cols pruned]
    → tokenize to raw (term, doc_id, dl)       [explode, no pre-agg]
    → shard = doc_id * n_shards // n_docs      [global doc-range sharding]
    → repartition(term, shard) + local sort    [Sorter::insert + spill-sort]
    → mapInPandas run-length merge + encode    [Sorter::write_chunk: adjacent
                                                equal keys merge, delta+varbyte
                                                blocks with block-max metadata;
                                                shards are doc-disjoint so
                                                (shard, block_id) is already
                                                the global merge order]
    → repartitionByRange(term) + sortWithin    [Writer's sorted immutable run]
    → parquet segments + term_dict + manifest.json

Why doc-range sharding (not hash salting): one mechanism solves three
problems —
1. skew: a head term ("the" at web scale) splits into n_shards bounded
   groups, each ≤ docs_per_shard postings (grenad dump_threshold,
   src/sorter.rs:17-19);
2. distributed query: every shard holds a complete sub-index for its doc
   range, so block-max WAND runs shard-parallel with exact local top-k;
3. mergeability: shard outputs are doc-disjoint, so the final merge never
   decodes payloads — it only renumbers block rows (~1/128 of postings).

Doc lengths (dl) are embedded per posting, so query UDFs score BM25 with no
norms join — the posting stream is self-contained.

Checkpoint-resume: stages are skipped when their output exists (parquet
_SUCCESS). A killed build resumes from the last completed stage; the manifest
records per-file lineage + build metrics (north_rule).
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from grenad_spark.functions.tokenize import term_doc_tf, tokens_col
from grenad_spark.functions.varbyte import encode_posting_blocks

SEGMENT_SCHEMA = (
    "term string, shard int, block_id int, n int, first_doc long, last_doc long, "
    "max_tf int, min_dl int, min_tf int, max_dl int, sum_tf long, payload binary"
)

# grenad dump_threshold analog: bounds postings per applyInPandas group
# (2M postings ≈ 48 MB decoded). Local tests use small corpora; bench lowers
# it to force multi-shard paths.
DEFAULT_DOCS_PER_SHARD = 2_000_000


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


# Live build progress — the Sorter::estimated_dumped_memory_usage analog
# (reference src/sorter.rs:460-468: callers poll how much the sorter would
# dump). Spark accumulators update as encode tasks COMPLETE, so a monitor
# thread can poll LAST_BUILD_PROGRESS[...]​.value mid-build for dumped bytes/
# postings so far. Standard accumulator caveat: task RETRIES double-count
# (at-least-once), which is fine for a progress estimate; the manifest
# records the authoritative totals recomputed from the written table.
LAST_BUILD_PROGRESS: dict = {}


def _make_encode_stream(
    payload_codec: str = "none",
    block_size: int | None = None,
    acc_bytes=None,
    acc_postings=None,
):
    def fn(batches):
        return _encode_partition_stream(
            batches, payload_codec, block_size, acc_bytes, acc_postings
        )
    return fn


def _encode_partition_stream(
    batches,
    payload_codec: str = "none",
    block_size: int | None = None,
    acc_bytes=None,
    acc_postings=None,
) -> "pd.DataFrame":
    """Sorter::write_chunk analog, partition-at-a-time.

    Input: Arrow batches of one shuffle partition of the RAW token stream
    (term, shard, doc_id, dl) — one row per token OCCURRENCE, pre-sorted by
    (term, shard, doc_id). Duplicate (term, doc) rows are adjacent after the
    sort, so tf is a run length — exactly grenad's group-adjacent-equal-keys
    merge during write_chunk (src/sorter.rs:541-561), done with one
    np.unique pass. No pandas groupby, no per-group DataFrame construction;
    Python touches each GROUP once (the vectorized encode call), never each
    row. block_id is local to (term, shard): shards are doc-range disjoint
    and ascending, so (shard, block_id) is already the global doc order —
    no cross-group renumbering pass is needed.
    """
    import numpy as np

    pdfs = [p for p in batches]
    if not pdfs:
        return
    pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
    if len(pdf) == 0:
        return
    terms = pdf["term"].to_numpy()
    shards = pdf["shard"].to_numpy()
    doc = pdf["doc_id"].to_numpy()
    dl = pdf["dl"].to_numpy()
    # raw token stream has no tf column (tf = run length); the compaction
    # path feeds pre-aggregated rows WITH tf (summed per doc run below)
    tf_col = pdf["tf"].to_numpy() if "tf" in pdf.columns else None
    change = np.flatnonzero((terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(pdf)]))
    rows = []
    for s, e in zip(starts, ends):
        # run-length tf: docs sorted within the group, duplicates adjacent.
        # Boundary-diff, NOT np.unique: unique re-sorts its input (O(n log n)
        # plus a copy) when the upstream sortWithinPartitions already
        # guarantees order — in the memory-bandwidth-bound encode phase the
        # redundant sort is pure bus traffic. Unsorted input cannot slip
        # through silently: the diff pass would emit duplicate docs and
        # encode_posting_blocks' strictly-increasing assertion (the grenad
        # Writer::insert key-order contract) fires.
        d = doc[s:e]
        run_bounds = np.flatnonzero(d[1:] != d[:-1]) + 1
        first_idx = np.concatenate(([0], run_bounds))
        uniq_docs = d[first_idx]
        if tf_col is None:
            tf = np.diff(np.concatenate((first_idx, [d.size])))
        else:
            tf = np.add.reduceat(tf_col[s:e], first_idx)
        for block_id, (
            n, first, last, max_tf, min_dl, min_tf, max_dl, sum_tf, payload
        ) in enumerate(
            encode_posting_blocks(
                uniq_docs, tf, dl[s:e][first_idx],
                *( [block_size] if block_size else [] ),
            )
        ):
            if payload_codec != "none":
                from grenad_spark.functions.varbyte import compress_payload

                payload = compress_payload(payload, payload_codec)
            rows.append(
                (
                    terms[s], int(shards[s]), block_id, n, first, last,
                    max_tf, min_dl, min_tf, max_dl, sum_tf, payload,
                )
            )
    if acc_bytes is not None and rows:
        acc_bytes.add(sum(len(r[11]) for r in rows))
        acc_postings.add(sum(r[3] for r in rows))
    yield pd.DataFrame(
        rows,
        columns=[
            "term", "shard", "block_id", "n", "first_doc", "last_doc",
            "max_tf", "min_dl", "min_tf", "max_dl", "sum_tf", "payload",
        ],
    )


def tokens_with_dl(docs: DataFrame, tokens_fn=None) -> DataFrame:
    """(term, doc_id, dl, tf) aggregated token stream — one row per
    (term, doc) with its term frequency.

    tf is computed INSIDE one JVM projection (array_sort + run-length over
    the per-doc token array), not with a groupBy: duplicate (term, doc) rows
    only ever exist within a single document, so the per-doc reduction IS
    the global aggregation and the groupBy's full shuffle of the aggregated
    stream is pure overhead (guide §2.4 — measured 8.9 → 7.9 s for the whole
    segments pipeline at 640k docs; plan goes 2 exchanges → 1). The encoder
    still accepts raw streams (tf column optional) for callers like
    compaction.

    The token array is materialized in a projection BELOW the explode so the
    regex split runs once per document; putting size(split(...)) in the same
    select as the explode would re-evaluate it once per exploded row (a ~50×
    regex blow-up measured at sf0.1×16).
    """
    tk = tokens_fn or tokens_col
    toks = docs.select("doc_id", tk("text").alias("toks"))
    srt = toks.select(
        "doc_id", F.size("toks").alias("dl"), F.array_sort("toks").alias("ts")
    )
    # st[j] = 1-based index of each run start in the sorted token array;
    # tf of run j = next run's start − this run's start
    stage = srt.select(
        "doc_id",
        "dl",
        "ts",
        F.expr(
            "filter(sequence(1, size(ts)), i -> i = 1 OR ts[i-1] != ts[i-2])"
        ).alias("st"),
    )
    pairs = stage.select(
        "doc_id",
        "dl",
        F.explode(
            F.expr(
                "transform(sequence(1, size(st)), j -> struct("
                "ts[st[j-1]-1] AS term, "
                "CAST((CASE WHEN j = size(st) THEN size(ts)+1 ELSE st[j] END)"
                " - st[j-1] AS INT) AS tf))"
            )
        ).alias("p"),
    )
    return pairs.select(
        F.col("p.term").alias("term"), "doc_id", "dl", F.col("p.tf").alias("tf")
    )


def build_segments(
    token_stream: DataFrame,
    n_docs: int,
    n_shards: int,
    partitions: int | None = None,
    payload_codec: str = "none",
    block_size: int | None = None,
    track_progress: bool = False,
) -> DataFrame:
    """(term, doc_id, dl) raw token stream -> segment block rows.

    ONE hash shuffle on (term, shard) + partition-local sort + streaming
    run-length-merge encode. Partition memory is bounded by rows/partitions
    (config), group memory by docs_per_shard — grenad's dump_threshold twice
    over. No window/renumber pass: (shard, block_id) is globally doc-ordered
    because shards are doc-range disjoint (the src/merger.rs:51-57
    deterministic merge order by construction).
    """
    # integer floor division (BIGINT DIV): double division would lose
    # precision past 2^53 (~10^12 docs × 5e5 shards at the SCALE.md design
    # point) and silently shift shard boundaries
    sharded = token_stream.withColumn(
        "shard",
        F.expr(
            f"CAST((doc_id * CAST({int(n_shards)} AS BIGINT)) DIV "
            f"CAST({int(n_docs)} AS BIGINT) AS INT)"
        ),
    )
    if partitions is None:
        partitions = sharded.sparkSession.sparkContext.defaultParallelism
    acc_b = acc_p = None
    if track_progress:
        sc = sharded.sparkSession.sparkContext
        acc_b = sc.accumulator(0)
        acc_p = sc.accumulator(0)
        LAST_BUILD_PROGRESS["encoded_payload_bytes"] = acc_b
        LAST_BUILD_PROGRESS["encoded_postings"] = acc_p
    return (
        sharded.repartition(partitions, "term", "shard")
        .sortWithinPartitions("term", "shard", "doc_id")
        .mapInPandas(
            _make_encode_stream(payload_codec, block_size, acc_b, acc_p),
            SEGMENT_SCHEMA,
        )
    )


def term_dict_from_segments(segments: DataFrame) -> DataFrame:
    """(term, df, cf, n_blocks, max_tf) — grenad's index footer as a table."""
    return segments.groupBy("term").agg(
        F.sum("n").cast("long").alias("df"),
        F.sum("sum_tf").cast("long").alias("cf"),
        F.count("*").cast("int").alias("n_blocks"),
        F.max("max_tf").cast("int").alias("max_tf"),
    )


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    *,
    partitions: int | None = None,
    docs_per_shard: int = DEFAULT_DOCS_PER_SHARD,
    n_shards: int | None = None,
    overwrite: bool = False,
    compression: str = "zstd",
    payload_codec: str = "none",
    payload_codec_level: int | None = None,
    block_size: int | None = None,
    tokenizer=None,
) -> "IndexHandle":
    """Run the full build; resumable per-stage. docs needs (doc_id, text).
    tokenizer = optional functions/toksettings.TokenizerSettings: its
    tokens_col replaces the default tokenizer in BOTH tokenizing stages
    (doc lengths + segment stream) and its tag is recorded in the manifest
    so a resume can never silently mix token streams.
    block_size = postings per block (grenad WriterBuilder::block_size analog;
    default BLOCK_SIZE=128). payload_codec_level = grenad
    WriterBuilder::compression_level (src/writer.rs:46-52): honored for
    zlib/zstd/lz4, ignored for snappy/none (see functions/varbyte.py);
    recorded in the manifest as the "name:level" codec string so compaction
    and readers inherit it."""
    from grenad_spark.functions.varbyte import split_codec

    if payload_codec_level is not None:
        if ":" in payload_codec:
            raise ValueError(
                "pass the level either inside payload_codec ('zstd:19') or "
                "via payload_codec_level, not both"
            )
        payload_codec = f"{payload_codec}:{payload_codec_level}"
    split_codec(payload_codec)  # fail fast on the driver, not inside a UDF
    t0 = time.time()
    # AQE off for the build: every partitioning here is explicit (repartition
    # on (term, shard), range write), so adaptive re-planning only inserts
    # query-stage materialization barriers — measured +8.5s fixed overhead at
    # 16 cores on a 640k-doc build. Restored on exit for query workloads,
    # where AQE (skew joins, coalescing) genuinely helps.
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _build_index_inner(
            spark, docs, out_dir, t0,
            partitions=partitions, docs_per_shard=docs_per_shard,
            n_shards=n_shards, overwrite=overwrite, compression=compression,
            payload_codec=payload_codec, block_size=block_size,
            tokenizer=tokenizer,
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)


def _build_index_inner(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    t0: float,
    *,
    partitions: int | None,
    docs_per_shard: int,
    n_shards: int | None,
    overwrite: bool,
    compression: str,
    payload_codec: str,
    block_size: int | None = None,
    tokenizer=None,
) -> "IndexHandle":
    tokens_fn = tokenizer.tokens_col if tokenizer is not None else None
    if overwrite and os.path.exists(out_dir):
        import shutil

        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    seg_path = os.path.join(out_dir, "segments")
    dict_path = os.path.join(out_dir, "term_dict")
    stats_path = os.path.join(out_dir, "corpus_stats")
    docs_path = os.path.join(out_dir, "docs")
    manifest_path = os.path.join(out_dir, "manifest.json")
    # fully-built index: the manifest is the LAST artifact written, so its
    # presence (plus EVERY stage's _SUCCESS, auxiliary typo tables included)
    # means resume has nothing to do — return the handle without launching a
    # single Spark job. An index missing an auxiliary stage (e.g. built
    # before term_deletes existed) falls through to the per-stage guards
    # below and gets upgraded in place.
    if os.path.exists(manifest_path) and all(
        _done(p)
        for p in (
            docs_path, stats_path, seg_path, dict_path,
            os.path.join(out_dir, "term_bigrams"),
            os.path.join(out_dir, "term_deletes"),
        )
    ):
        return IndexHandle(out_dir)
    partitions = partitions or spark.sparkContext.defaultParallelism
    docs = docs.select("doc_id", "text")
    # Pre-shuffle parallelism guard: a narrow input (single parquet file,
    # small cached table) would run the tokenize+explode map side on 1-2
    # tasks. At cluster scale the scan has thousands of splits and this is a
    # no-op; locally it redistributes before the heavy map work.
    if docs.rdd.getNumPartitions() < max(2, partitions // 2):
        docs = docs.repartition(partitions)

    stage_secs: dict[str, float] = {}

    # stage 1: doc membership table (doc_id, dl) — BM25 norms + the
    # "which docs does this generation contain" record that compaction's
    # newest-generation-wins tombstone semantics require. The ONLY stage that
    # tokenizes besides the segment build itself.
    #
    # OVERLAP (guide §2.6): the segments stage below only depends on the
    # STATS (n_docs/avgdl/max_doc for shard geometry), not on the docs
    # parquet — so tokenize once into a small cached (doc_id, dl) table,
    # grab the stats from it directly, and let the docs + corpus_stats
    # WRITES run from a background thread while the segments pipeline
    # already tokenizes: the 2-3 s docs write hides behind the segment
    # stage's map work. Per-stage _SUCCESS guards keep resume semantics —
    # a crash mid-overlap just re-runs the unfinished stage.
    docs_write_fut = None
    dl_cached = None
    if _done(docs_path) and not _done(stats_path):
        # resume path: docs written, stats missing — derive stats from the
        # parquet instead of re-tokenizing
        ts = time.time()
        spark.read.parquet(docs_path).select(
            F.count("*").cast("long").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
            F.max("doc_id").cast("long").alias("max_doc"),
        ).coalesce(1).write.mode("overwrite").parquet(stats_path)
        stage_secs["corpus_stats"] = time.time() - ts
    if not _done(docs_path):
        ts = time.time()
        from pyspark.storagelevel import StorageLevel

        from grenad_spark.index.stats import doc_lengths

        dl_cached = doc_lengths(docs, tokens_fn=tokens_fn).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        st = dl_cached.select(
            F.count("*").cast("long").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
            F.max("doc_id").cast("long").alias("max_doc"),
        ).first()
        stage_secs["docs_stats"] = time.time() - ts

        def _write_docs_and_stats():
            if not _done(docs_path):
                # no repartition (an exchange to few partitions made this
                # stage serialize on 8 writer tasks), but a narrow coalesce
                # to partitions//4 files: 4x fewer files for every reader
                # that re-scans the docs table (guide §6)
                dl_cached.coalesce(
                    max(1, partitions // 4)
                ).write.mode("overwrite").parquet(docs_path)
            if not _done(stats_path):
                spark.createDataFrame(
                    [(int(st["n_docs"]), float(st["avgdl"]), int(st["max_doc"]))],
                    "n_docs long, avgdl double, max_doc long",
                ).coalesce(1).write.mode("overwrite").parquet(stats_path)

        from concurrent.futures import ThreadPoolExecutor

        _docs_pool = ThreadPoolExecutor(max_workers=1)
        docs_write_fut = _docs_pool.submit(_write_docs_and_stats)
        stage_secs["docs"] = 0.0  # overlapped; settled when the future joins
    else:
        st = spark.read.parquet(stats_path).first()
    n_docs, avgdl, max_doc = st["n_docs"], st["avgdl"], st["max_doc"]
    if n_shards is None:
        # docs_per_shard is a MEMORY bound (grenad dump_threshold), not a
        # layout target: a mid-size corpus would otherwise get 1-2 giant
        # shards and serving parallelism collapses (measured 15.3 s vs 1.4 s
        # for the same 12-query batch at 2 vs 128 shards). Floor the count
        # at the session's core count — shards are doc-disjoint so more of
        # them is always correct, groups only get SMALLER, and the query
        # side coalesces consecutive shards back to ~core-count groups.
        by_mem = -(-(max_doc + 1) // docs_per_shard)
        par_floor = min(
            spark.sparkContext.defaultParallelism, max(1, (max_doc + 1) // 64)
        )
        n_shards = max(1, by_mem, par_floor)
    doc_space = max_doc + 1

    # stage 3 paths (needed by both branches below)
    # stage 3b: persisted typo index — (gram, term) vocabulary bigrams, the
    # table Meilisearch precomputes for typo tolerance. Built ONCE here so
    # fuzzy expansion is a pruned scan + join instead of re-exploding the
    # whole term dictionary per query batch (at a 10^9-term web vocabulary
    # that explode is a full-dictionary pass per batch). Range-partitioned on
    # gram: the query side pushes gram IN (...) into the scan → file pruning.
    bigrams_path = os.path.join(out_dir, "term_bigrams")
    # stage 3c: SymSpell-style deletion-variant table — (delvar, term) for
    # every variant reachable by deleting ≤ MAX_DELETES chars. Serves
    # max_edits=2 fuzzy expansion WITHOUT any vocabulary scan: if
    # lev(q, t) ≤ d then deleting ≤ d chars from each reaches a common
    # string (each edit contributes at most one deletion per side), so
    # candidates = delvar-equi-join of the two sides' deletion neighborhoods,
    # then an exact levenshtein filter. The query side's neighborhood is
    # driver-tiny; this table is the vocabulary side, precomputed once.
    deletes_path = os.path.join(out_dir, "term_deletes")

    def _write_dict_from(seg_df) -> None:
        term_dict_from_segments(seg_df).repartitionByRange(
            max(1, partitions // 8), "term"
        ).sortWithinPartitions("term").write.mode("overwrite").parquet(dict_path)

    def _write_aux() -> None:
        # 3b and 3c both derive from the written term_dict and are
        # independent of each other — submit them from a small thread pool
        # so the second job's tasks back-fill executors freed by the first
        # job's tail (vocabulary-sized jobs: their cost is scheduling
        # overhead, which overlaps fully).
        aux_jobs = []
        if not _done(bigrams_path):
            aux_jobs.append(
                lambda: write_term_bigrams(
                    spark, dict_path, bigrams_path, max(1, partitions // 8))
            )
        if not _done(deletes_path):
            aux_jobs.append(
                lambda: write_term_deletes(
                    spark, dict_path, deletes_path, max(1, partitions // 8))
            )
        if len(aux_jobs) == 1:
            aux_jobs[0]()
        elif aux_jobs:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(aux_jobs)) as pool:
                for fut in [pool.submit(fn) for fn in aux_jobs]:
                    fut.result()

    # authoritative dumped-bytes/postings totals for the manifest (the live
    # accumulators in LAST_BUILD_PROGRESS show the same numbers mid-build; a
    # resumed build's accumulators would be partial, so the manifest
    # recomputes from the block-row table — one column-pruned agg)
    def _enc_agg(seg_df):
        return seg_df.agg(
            F.sum("n").cast("long").alias("p"),
            F.sum(F.length("payload")).cast("long").alias("b"),
        ).first()

    enc = None
    # stage 2: segments (the wide shuffle + encode)
    if not _done(seg_path):
        ts = time.time()
        segments = build_segments(
            tokens_with_dl(docs, tokens_fn=tokens_fn), doc_space, n_shards, partitions,
            payload_codec, block_size, track_progress=True,
        )
        # Materialize block rows before the range write: repartitionByRange
        # SAMPLES its child to pick boundaries, which would re-run the whole
        # tokenize→shuffle→encode pipeline a second time. Block rows are
        # ~1/100 of the token stream (varbyte-packed), so caching them costs
        # far less than the recompute; on a real cluster this is a staging
        # write. MEMORY_AND_DISK: spill, don't recompute.
        from pyspark.storagelevel import StorageLevel

        segments = segments.persist(StorageLevel.MEMORY_AND_DISK)
        # one count materializes the cache (the expensive pipeline runs
        # exactly once); every downstream job below reads the cached rows
        segments.count()
        stage_secs["segments_encode"] = time.time() - ts
        ts = time.time()

        # The range write, the term_dict chain (dict → bigrams ∥ deletes)
        # and the manifest accounting agg are mutually independent consumers
        # of the cached block rows — run them concurrently so the
        # vocabulary-sized jobs hide entirely behind the segment write's
        # tail (driver threads submitting jobs; FIFO scheduling back-fills).
        def _seg_write():
            # storage codec = grenad's per-block compression_type
            # (src/compression.rs:9-28) at the parquet layer; posting
            # payloads are additionally varbyte-packed inside the blocks.
            # partitions//4 output files, not `partitions`: block rows are
            # ~1/100 of the token stream, and every serving query pays a
            # per-file open/footer cost on the pruned scan (measured ~3 ms
            # × 64 files = most of a single query's 226 ms scan time at
            # sf0.1×128; 16 larger files cut it ~4×). The same ratio holds
            # at cluster scale: scan partitions are sized by bytes, so
            # fewer-but-larger segment files only reduce footer overhead.
            (
                segments.repartitionByRange(
                    max(1, partitions // 4), "term", "shard", "block_id"
                )
                .sortWithinPartitions("term", "shard", "block_id")
                .write.mode("overwrite")
                .option("compression", compression)
                .parquet(seg_path)
            )

        def _dict_chain():
            if not _done(dict_path):
                _write_dict_from(segments)
            _write_aux()

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            futs = [
                pool.submit(_seg_write),
                pool.submit(_dict_chain),
                pool.submit(lambda: _enc_agg(segments)),
            ]
            futs[0].result()
            futs[1].result()
            enc = futs[2].result()
        segments.unpersist()
        stage_secs["segments_finalize"] = time.time() - ts
    if docs_write_fut is not None:
        # join the overlapped docs/stats writes; the recorded time is only
        # the non-hidden tail (usually ~0 — the write finished while the
        # segments pipeline ran)
        ts = time.time()
        docs_write_fut.result()
        _docs_pool.shutdown()
        dl_cached.unpersist()
        docs_write_fut = None
        stage_secs["docs"] = round(time.time() - ts, 3)
    segments = spark.read.parquet(seg_path)

    # stage 3 (resume path): term_dict (vocabulary-sized) + aux tables from
    # the written segments when stage 2 was already complete
    if not _done(dict_path):
        ts = time.time()
        _write_dict_from(segments)
        stage_secs["term_dict"] = time.time() - ts
    ts = time.time()
    _write_aux()
    if time.time() - ts > 0.05:
        stage_secs["term_aux"] = time.time() - ts

    # stage 4: manifest — per-file lineage + metrics (north_rule); the
    # grenad metadata footer (src/metadata.rs:105-115) of this index.
    if not os.path.exists(manifest_path):
        # vocabulary size: parquet row-count from file footers (metadata-only
        # job) — lets df_map() gate on the manifest with no count job per
        # handle. UNDER the manifest guard so a resumed/no-op build launches
        # zero Spark jobs.
        n_terms = spark.read.parquet(dict_path).count()
        files = [
            {"file": f, "bytes": os.path.getsize(os.path.join(seg_path, f))}
            for f in sorted(os.listdir(seg_path))
            if f.endswith(".parquet")
        ]
        if enc is None:
            enc = _enc_agg(segments)
        manifest = {
            "format_version": CURRENT_FORMAT_VERSION,
            "built_at_unix": int(t0),
            "n_docs": int(n_docs),
            "avgdl": float(avgdl),
            "max_doc": int(max_doc),
            "n_terms": int(n_terms),
            "n_shards": int(n_shards),
            "docs_per_shard": docs_per_shard,
            "payload_codec": payload_codec,
            "block_size": block_size,
            "partitions": partitions,
            "stage_seconds": {k: round(v, 3) for k, v in stage_secs.items()},
            "build_seconds": round(time.time() - t0, 3),
            "encoded_postings": int(enc["p"] or 0),
            "encoded_payload_bytes": int(enc["b"] or 0),
            "segment_files": files,
        }
        if tokenizer is not None:
            manifest["tokenizer_tag"] = tokenizer.tag()
        with open(manifest_path, "w") as fh:
            json.dump(manifest, fh, indent=1)
    return IndexHandle(out_dir)


# deletion-variant depth of the persisted SymSpell table (supports fuzzy
# expansion up to max_edits == MAX_DELETES without a vocabulary scan)
MAX_DELETES = 2


def write_term_deletes(
    spark: SparkSession, dict_path: str, out_path: str, partitions: int
) -> None:
    """(delvar, term) SymSpell deletion table from a persisted term_dict:
    every string reachable from a vocabulary term by deleting ≤ MAX_DELETES
    characters (including the term itself at 0 deletions). 100% JVM-side —
    two explode+substring passes, no Python. ~1 + L + L(L-1)/2 rows per
    term of length L (≈40 rows at L=8). Range-partitioned on delvar so the
    query side's delvar IN (…) prunes files (the same layout contract as
    term_bigrams)."""
    t0 = spark.read.parquet(dict_path).select("term")
    # one deletion: position i ∈ [1, L] (SQL substring is 1-based)
    d1 = t0.select(
        "term",
        F.explode(F.sequence(F.lit(1), F.length("term"))).alias("i"),
    ).select(
        "term",
        F.concat(
            F.expr("substring(term, 1, i - 1)"), F.expr("substring(term, i + 1)")
        ).alias("d1"),
    )
    # two deletions: delete again from each 1-deletion variant
    d2 = (
        d1.filter(F.length("d1") > 0)
        .select(
            "term", "d1",
            F.explode(F.sequence(F.lit(1), F.length("d1"))).alias("j"),
        )
        .select(
            "term",
            F.concat(
                F.expr("substring(d1, 1, j - 1)"), F.expr("substring(d1, j + 1)")
            ).alias("delvar"),
        )
    )
    all_vars = (
        t0.select("term", F.col("term").alias("delvar"))
        .unionByName(d1.select("term", F.col("d1").alias("delvar")))
        .unionByName(d2)
        .distinct()
    )
    (
        all_vars.repartitionByRange(partitions, "delvar")
        .sortWithinPartitions("delvar", "term")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def write_term_bigrams(
    spark: SparkSession, dict_path: str, out_path: str, partitions: int
) -> None:
    """(gram, term) vocabulary-bigram table from a persisted term_dict —
    distinct (a repeated bigram inside one term adds nothing), gram-range
    partitioned and sorted for pruned expansion scans."""
    from grenad_spark.functions.tokenize import char_bigrams

    (
        spark.read.parquet(dict_path)
        .select("term", F.explode(char_bigrams(F.col("term"))).alias("gram"))
        .distinct()
        .repartitionByRange(partitions, "gram")
        .sortWithinPartitions("gram", "term")
        .write.mode("overwrite")
        .parquet(out_path)
    )


# Manifest format versions this engine can open (the src/metadata.rs:39-91
# version-dispatch analog; grenad 0.5 reads 0.4 files, src/writer.rs:373-413):
#   0 — pre-codec manifests: no payload_codec key (implied "none")
#   1 — payload_codec recorded explicitly
#   2 — current: segment blocks carry min_tf/max_dl lower-bound metadata
#       (pre-shuffle pruning); v0/v1 indexes open fine, serving just skips
#       the metadata prune pass for them
SUPPORTED_FORMAT_VERSIONS = (0, 1, 2)
CURRENT_FORMAT_VERSION = 2


class IndexHandle:
    """Open index: lazy accessors over the persisted tables (Reader::new
    analog, src/reader/mod.rs:22-26 — the manifest is the metadata footer)."""

    def __init__(self, path: str):
        self.path = path
        self._dfs: dict[str, DataFrame] = {}
        with open(os.path.join(path, "manifest.json")) as fh:
            self.manifest = json.load(fh)
        self.format_version: int = int(self.manifest.get("format_version", 0))
        if self.format_version not in SUPPORTED_FORMAT_VERSIONS:
            from grenad_spark.errors import InvalidFormatVersion

            raise InvalidFormatVersion(
                f"index at {path} has format_version {self.format_version}; "
                f"this engine reads {SUPPORTED_FORMAT_VERSIONS}"
            )
        self.n_docs: int = self.manifest["n_docs"]
        self.avgdl: float = self.manifest["avgdl"]
        self.n_shards: int = self.manifest["n_shards"]
        if self.format_version == 0:
            # v0 predates payload codecs: payloads are always raw varbyte
            self.payload_codec: str = "none"
        else:
            self.payload_codec = self.manifest.get("payload_codec", "none")

    def _table(self, spark: SparkSession, name: str) -> DataFrame:
        # memoized per (session, table): reusing the DataFrame keeps the
        # resolved file index (listing + schema) across queries — repeated
        # single-query serving otherwise re-lists the segment files each time
        key = f"{id(spark)}:{name}"
        if key not in self._dfs:
            self._dfs[key] = spark.read.parquet(os.path.join(self.path, name))
        return self._dfs[key]

    def segments(self, spark: SparkSession) -> DataFrame:
        return self._table(spark, "segments")

    def term_dict(self, spark: SparkSession) -> DataFrame:
        return self._table(spark, "term_dict")

    def docs(self, spark: SparkSession) -> DataFrame:
        """(doc_id, dl) membership/norms table."""
        return self._table(spark, "docs")

    def term_bigrams(self, spark: SparkSession) -> DataFrame:
        """(gram, term) persisted typo index (fuzzy-expansion candidates via
        gram equi-join). Indexes built before this table existed fall back to
        deriving it from term_dict on the fly — correct, but a full-vocab
        explode per use; rebuild or call write_term_bigrams to persist."""
        p = os.path.join(self.path, "term_bigrams")
        if _done(p):
            return self._table(spark, "term_bigrams")
        from grenad_spark.functions.tokenize import char_bigrams

        return (
            self.term_dict(spark)
            .select("term", F.explode(char_bigrams(F.col("term"))).alias("gram"))
            .distinct()
        )

    def positions(self, spark: SparkSession) -> DataFrame:
        """(term, shard, block_id, n, first_doc, last_doc, header, positions)
        positional blocks (index/positions.py — the Meilisearch
        word-position-database layer). Raises if the table was never built;
        call build_positions(spark, docs, index_dir) to add it."""
        p = os.path.join(self.path, "positions")
        if not _done(p):
            raise FileNotFoundError(
                f"index at {self.path} has no positions table — "
                f"build_positions() adds it (needs the original docs)"
            )
        return self._table(spark, "positions")

    def has_positions(self) -> bool:
        return _done(os.path.join(self.path, "positions"))

    def prefix_segments(self, spark: SparkSession) -> DataFrame:
        """Materialized prefix posting blocks (index/prefix.py — the
        Meilisearch word_prefix_docids analog; same SEGMENT_SCHEMA with the
        prefix in the term column). Raises if the stage never ran."""
        p = os.path.join(self.path, "prefix_postings")
        if not _done(p):
            raise FileNotFoundError(
                f"index at {self.path} has no prefix_postings table — "
                f"build_prefix_postings() adds it (needs the original docs)"
            )
        return self._table(spark, "prefix_postings")

    def prefix_dict(self, spark: SparkSession) -> DataFrame | None:
        """(prefix, df, cf, n_blocks, max_tf) footer stats of the
        materialized prefixes; None when the stage never ran (serving then
        expands every prefix against term_dict — correct, just fan-out)."""
        p = os.path.join(self.path, "prefix_dict")
        if _done(p):
            return self._table(spark, "prefix_dict")
        return None

    def has_prefix_postings(self) -> bool:
        return _done(os.path.join(self.path, "prefix_postings")) and _done(
            os.path.join(self.path, "prefix_dict")
        )

    def pair_segments(self, spark: SparkSession) -> DataFrame:
        """Materialized pair-proximity posting blocks (index/pairprox.py —
        the Meilisearch word_pair_proximity_docids analog; SEGMENT_SCHEMA
        with the canonical 'a b' pair in the term column and the min token
        distance riding tf). Raises if the stage never ran."""
        p = os.path.join(self.path, "pair_proximity")
        if not _done(p):
            raise FileNotFoundError(
                f"index at {self.path} has no pair_proximity table — "
                f"build_pair_proximity() adds it (needs the original docs)"
            )
        return self._table(spark, "pair_proximity")

    def pair_dict(self, spark: SparkSession) -> DataFrame | None:
        """(pair, df, cf, n_blocks, max_tf) footer stats of the materialized
        pairs; None when the stage never ran."""
        p = os.path.join(self.path, "pair_dict")
        if _done(p):
            return self._table(spark, "pair_dict")
        return None

    def has_pair_proximity(self) -> bool:
        return _done(os.path.join(self.path, "pair_proximity")) and _done(
            os.path.join(self.path, "pair_dict")
        )

    def prefix_pair_segments(self, spark: SparkSession) -> DataFrame:
        """Materialized (word, prefix) pair-proximity blocks (index/
        pairprox.py — the Meilisearch word_prefix_pair_proximity_docids
        analog; SEGMENT_SCHEMA with 'word prefix' in the term column and
        the min token distance riding tf). Raises if the stage never ran."""
        p = os.path.join(self.path, "prefix_pair_proximity")
        if not _done(p):
            raise FileNotFoundError(
                f"index at {self.path} has no prefix_pair_proximity table — "
                f"build_prefix_pair_proximity() adds it (needs the original docs)"
            )
        return self._table(spark, "prefix_pair_proximity")

    def prefix_pair_dict(self, spark: SparkSession) -> DataFrame | None:
        """(pair, df, cf, n_blocks, max_tf) footer stats of the materialized
        (word, prefix) pairs; None when the stage never ran (the prefix
        slot then expands against term_dict + the full-word pair DB)."""
        p = os.path.join(self.path, "prefix_pair_dict")
        if _done(p):
            return self._table(spark, "prefix_pair_dict")
        return None

    def has_prefix_pair_proximity(self) -> bool:
        return _done(os.path.join(self.path, "prefix_pair_proximity")) and _done(
            os.path.join(self.path, "prefix_pair_dict")
        )

    def term_deletes(self, spark: SparkSession) -> DataFrame | None:
        """(delvar, term) persisted SymSpell deletion table (max_edits=2
        expansion via delvar equi-join — no vocabulary scan). Returns None
        for indexes built before this table existed; callers fall back to
        the length-banded vocabulary scan (correct, a bounded slice)."""
        p = os.path.join(self.path, "term_deletes")
        if _done(p):
            return self._table(spark, "term_deletes")
        return None

    # ---- user-facing search API (what a reference user calls after the
    # switch; thin delegates to query/search.py so the handle is the one
    # object to hold) ------------------------------------------------------

    def search(self, spark: SparkSession, queries, k: int = 10, mode: str = "wand") -> DataFrame:
        """Top-k BM25. mode: 'wand' (single-pass serving) | 'wand_pruned'
        (two-pass metadata prune — shuffle ∝ surviving blocks; best when
        pruning bites, e.g. zipfian corpora) | 'exhaustive' | 'wand_cursor'
        (algorithm-faithful reference/test variant; per-pivot Python, so
        groups beyond WAND_CURSOR_MAX_POSTINGS delegate to the batched
        kernel — don't pick it for serving)."""
        from grenad_spark.query.search import search_topk

        return search_topk(spark, self, queries, k=k, mode=mode)

    def search_batch(self, spark: SparkSession, queries, k: int = 10) -> DataFrame:
        """Decode-once-score-many batch serving (best for query batches)."""
        from grenad_spark.query.search import search_topk_shared

        return search_topk_shared(spark, self, queries, k=k)

    def search_auto(self, spark: SparkSession, queries, k: int = 10) -> DataFrame:
        """Gate-per-batch serving: measures the pass-1 survivor ratio and
        picks two-pass pruned vs single-pass WAND (query/search.py
        search_topk_auto)."""
        from grenad_spark.query.search import search_topk_auto

        return search_topk_auto(spark, self, queries, k=k)

    def search_prefix(self, spark: SparkSession, queries, k: int = 10, max_expansions: int | None = None) -> DataFrame:
        """Prefix search. Default None = exhaustive expansion (exact — the
        original public-handle behavior; existing callers keep identical
        top-k). Serving tiers facing web vocabularies should pass an explicit
        cap (e.g. query/search.py DEFAULT_MAX_EXPANSIONS=128, the
        Meilisearch-style top-df cap) — a 1-char prefix can expand to
        millions of terms otherwise."""
        from grenad_spark.query.search import search_topk_prefix

        return search_topk_prefix(spark, self, queries, k=k, max_expansions=max_expansions)

    def search_prefix_db(self, spark: SparkSession, queries, k: int = 10) -> DataFrame:
        """Prefix-as-one-word BM25 over the materialized prefix postings
        (index/prefix.py); unmaterialized prefixes fall back to dictionary
        expansion with identical semantics."""
        from grenad_spark.index.prefix import search_topk_prefix_db

        return search_topk_prefix_db(spark, self, queries, k=k)

    def search_fuzzy(self, spark: SparkSession, queries, k: int = 10, max_edits: int = 1) -> DataFrame:
        from grenad_spark.query.search import search_topk_fuzzy

        return search_topk_fuzzy(spark, self, queries, k=k, max_edits=max_edits)

    def search_fuzzy_ranked(
        self, spark: SparkSession, queries, k: int = 10, max_edits: int = 1
    ) -> DataFrame:
        """Typo-tolerant search under the words → typo → relevance rule
        pipeline (covered slots DESC, total typos ASC, BM25, doc)."""
        from grenad_spark.query.search import search_topk_fuzzy_ranked

        return search_topk_fuzzy_ranked(spark, self, queries, k=k, max_edits=max_edits)

    def search_words(self, spark: SparkSession, queries, k: int = 10) -> DataFrame:
        """The words ranking rule: more matched distinct terms first."""
        from grenad_spark.query.search import search_topk_words

        return search_topk_words(spark, self, queries, k=k)

    def search_and(self, spark: SparkSession, queries, k: int = 10) -> DataFrame:
        from grenad_spark.query.search import search_conjunctive

        return search_conjunctive(spark, self, queries, k=k)

    def search_phrase(self, spark: SparkSession, queries, k: int = 10) -> DataFrame:
        """Exact-phrase top-k (token adjacency) over the positional index;
        requires build_positions() to have run for this index."""
        from grenad_spark.query.phrase import search_topk_phrase

        return search_topk_phrase(spark, self, queries, k=k)

    def search_phrase_batch(self, spark: SparkSession, queries, k: int = 10) -> DataFrame:
        """Decode-once phrase batch (each distinct position block ships once
        per batch — best for phrase query batches)."""
        from grenad_spark.query.phrase import search_topk_phrase_shared

        return search_topk_phrase_shared(spark, self, queries, k=k)

    def search_mixed(self, spark: SparkSession, queries, k: int = 10) -> DataFrame:
        """Mixed query strings: free terms + double-quoted phrase
        constraints (the Meilisearch query language)."""
        from grenad_spark.query.phrase import search_topk_mixed

        return search_topk_mixed(spark, self, queries, k=k)

    def search_proximity(self, spark: SparkSession, queries, k: int = 10) -> DataFrame:
        """Proximity-ranked conjunctive top-k (Meilisearch proximity rule)
        over the positional index: summed adjacent-pair min position
        distance ASC, then BM25 DESC, then doc_id."""
        from grenad_spark.query.phrase import search_topk_proximity

        return search_topk_proximity(spark, self, queries, k=k)

    def search_sorted(
        self, spark: SparkSession, docs: DataFrame, queries, sort_col: str,
        k: int = 10, ascending: bool = False,
    ) -> DataFrame:
        """Sortable-attribute serving: conjunctive matches ranked by a
        document attribute (Meilisearch sort rule)."""
        from grenad_spark.query.search import search_topk_sorted

        return search_topk_sorted(
            spark, self, docs, queries, sort_col, k=k, ascending=ascending
        )

    def search_distinct(
        self, spark: SparkSession, docs: DataFrame, queries, distinct_col: str,
        k: int = 10,
    ) -> DataFrame:
        """Distinct-attribute serving: one best result per attribute value
        (Meilisearch distinctAttribute)."""
        from grenad_spark.query.search import search_topk_distinct_attr

        return search_topk_distinct_attr(spark, self, docs, queries, distinct_col, k=k)

    def seek_gte(self, spark: SparkSession, keys) -> DataFrame:
        """Batched posting-level gte-seeks [(seek_id, term, target_doc)]."""
        from grenad_spark.operators.seek import seek_gte_postings

        return seek_gte_postings(spark, self, keys)

    # serving-path df lookup: a driver-held {term: df} map loaded ONCE per
    # handle kills the per-query term_dict scan+broadcast job (~0.1 s/query).
    # Gated by vocabulary size — beyond IDF_MAP_MAX_TERMS (a 10^9-term web
    # vocabulary) callers fall back to the distributed broadcast join.
    IDF_MAP_MAX_TERMS = 2_000_000

    def df_map(self, spark: SparkSession) -> dict | None:
        if not hasattr(self, "_df_map"):
            n_terms = self.manifest.get("n_terms")
            if n_terms is None:
                n_terms = self.term_dict(spark).count()
            if n_terms <= self.IDF_MAP_MAX_TERMS:
                rows = self.term_dict(spark).select("term", "df").collect()
                self._df_map = {r["term"]: int(r["df"]) for r in rows}
            else:
                self._df_map = None
        return self._df_map

    # term → shard-set presence map (the df_map pattern one level deeper):
    # lets shard-level pruning (phrase prune_shards) run as pure driver set
    # intersection instead of a census job per batch. Entry count is
    # Σ_terms |shards(term)| ≤ n_terms × n_shards — gated so web-scale
    # vocabularies fall back to the distributed census.
    TERM_SHARDS_MAX_ENTRIES = 8_000_000

    def term_shards(self, spark: SparkSession) -> dict | None:
        if not hasattr(self, "_term_shards"):
            n_terms = self.manifest.get("n_terms")
            if n_terms is None:
                n_terms = self.term_dict(spark).count()
            if (
                n_terms <= self.IDF_MAP_MAX_TERMS
                and n_terms * max(1, int(self.n_shards))
                <= self.TERM_SHARDS_MAX_ENTRIES
            ):
                rows = (
                    self.segments(spark)
                    .select("term", "shard")
                    .distinct()
                    .collect()
                )
                m: dict[str, set] = {}
                for r in rows:
                    m.setdefault(r["term"], set()).add(int(r["shard"]))
                self._term_shards = m
            else:
                self._term_shards = None
        return self._term_shards
