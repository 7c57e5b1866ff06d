"""Index-backed BM25 search: exhaustive and block-max WAND paths.

Both paths answer top-k from the persisted segment table (never from raw
documents); both are shard-parallel:

  segments.filter(term ∈ query_terms)        [parquet min/max pruning — the
                                              index-footer descent of
                                              src/reader/reader_cursor.rs:291-331
                                              done by the storage layer]
    → per (query_id, shard) group            [each shard = complete sub-index
                                              for its doc range]
    → score inside an Arrow-batched UDF      [exhaustive: vectorized decode +
                                              bincount; wand: block-max
                                              cursor skipping, the
                                              BlockCursor::move_on_key_gte
                                              analog of src/block.rs:214-255]
    → per-shard top-k → global top-k         [ORDER BY score LIMIT k on k·S
                                              rows, driver-tiny]

Scale: the shuffle after the pruned scan carries only query-term block rows
(compressed); per-group memory is bounded by docs_per_shard. idf/UB constants
ride in via the grouping DataFrame (broadcast-joined), not closures.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from grenad_spark.functions.tokenize import TOKEN_SPLIT_RE
from grenad_spark.functions.varbyte import decode_block, decode_block_rows, decompress_payload, decompress_payloads
from grenad_spark.index.build import IndexHandle
from grenad_spark.query.bm25 import B, K1, SCORE_DECIMALS


PRUNE_EPS = 10.0 ** -SCORE_DECIMALS  # rounded-tie slack for WAND prune gates


def _driver_idf(n_docs: float, df: float) -> float:
    """BM25 idf computed driver-side — must stay formula-identical to the
    Spark/SQL expressions (the oracle equivalence tests pin all three)."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


# Scoring-group sizing target: postings per (qshard) group. The vectorized
# kernels decode ~1M postings in tens of ms, while every extra group pays a
# fixed Arrow→pandas→Python round trip (~15-20 ms measured); sizing groups
# by WORK instead of core count makes the plan scale-adaptive (guide §2):
# a single 1.5M-posting query runs in 1-2 groups (sweep: 16 groups = 373 ms,
# 1 group = 249 ms locally), a 64-query zipf batch or a cluster-sized index
# still saturates parallelism because the estimate grows with Σ df.
TARGET_GROUP_POSTINGS = 1_000_000


def _qshard_params(
    spark: SparkSession, index: IndexHandle, est_postings: int | None = None
) -> tuple[int, int]:
    """(g, n_qshards): how many consecutive doc-disjoint build shards merge
    into one scoring group. Default (no estimate) sizes groups to the
    session's core count; with an estimated posting volume (driver df map —
    Σ df over the batch's query-term pairs) groups are sized to
    TARGET_GROUP_POSTINGS each, capped at the core count: fewer Python
    round trips for small batches, unchanged parallelism for large ones."""
    par = max(1, spark.sparkContext.defaultParallelism)
    n_shards = max(1, index.n_shards)
    if est_postings is not None:
        desired = -(-max(1, int(est_postings)) // TARGET_GROUP_POSTINGS)
        par = max(1, min(par, desired))
    g = max(1, -(-n_shards // par))
    return g, -(-n_shards // g)


def _qshard_col(spark: SparkSession, index: "IndexHandle"):
    """Coalesced scoring-shard column, aliased back to `shard`: shard DIV g
    merges g consecutive doc-range-disjoint build shards into one scoring
    group (the _group_params coalescing, applied at the column level).
    Serving kernels never read the shard VALUE — they only group by it and
    re-sort blocks by first_doc — so relabeling is exact while cutting the
    pandas-group count (and its per-group Arrow→pandas overhead) by g×:
    a 12-query batch over 128 build shards went from 1536 kernel groups to
    192 with no plan change elsewhere."""
    g, _ = _qshard_params(spark, index)
    return (F.col("shard") / g).cast("int").alias("shard")


def _tfpart(tf, dl, avgdl):
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def _idf(n_docs: float, df):
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _tokenize_queries(queries: list[tuple[int, str]]) -> list[tuple[int, str]]:
    import re

    out = []
    for qid, q in queries:
        seen = set()
        for t in re.split(TOKEN_SPLIT_RE, q.lower()):
            if t and t not in seen:
                seen.add(t)
                out.append((qid, t))
    return out


def expand_prefix_queries(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
    max_expansions: int | None = None,
) -> list[tuple[int, str]]:
    """Expand trailing-`*` terms against the term dictionary — the PrefixIter
    query path (reference src/reader/prefix_iter.rs:8-94, used by Meilisearch
    for prefix/typo search). `spar*` becomes every dictionary term in
    [spar, spas) via one pruned term_dict scan; expanded terms then score as
    ordinary disjuncts. At web scale a 1-char prefix can expand to millions
    of terms — max_expansions caps each prefix to its highest-df expansions
    (what Meilisearch's prefix databases precompute); the contract queries
    run uncapped because the test vocabulary is small.
    """
    import re

    from grenad_spark.operators.seek import advance_str

    exact: list[tuple[int, str]] = []
    prefixes: list[tuple[int, str]] = []
    for qid, q in queries:
        for raw in q.lower().split():
            if raw.endswith("*"):
                p = re.sub(TOKEN_SPLIT_RE, "", raw[:-1])
                if p:
                    prefixes.append((qid, p))
            else:
                t = re.sub(TOKEN_SPLIT_RE, "", raw)
                if t:
                    exact.append((qid, t))
    pairs = set(exact)
    if prefixes:
        cond = None
        for _, p in set(prefixes):
            succ = advance_str(p)
            c = (F.col("term") >= p) & (F.col("term") < succ) if succ else (F.col("term") >= p)
            cond = c if cond is None else (cond | c)
        matched_df = index.term_dict(spark).filter(cond).select("term", "df")
        if max_expansions is not None:
            # per-prefix top-df cap. A term joins EVERY prefix it matches
            # (overlapping prefixes like `s*` and `sp*` each rank their own
            # full candidate range — a CASE-style single label would starve
            # one of them); rank within each prefix by (df desc, term asc)
            pdf = spark.createDataFrame(
                sorted({p for _, p in prefixes}), "string"
            ).withColumnRenamed("value", "prefix")
            w = Window.partitionBy("prefix").orderBy(F.desc("df"), F.asc("term"))
            kept_rows = (
                matched_df.join(
                    F.broadcast(pdf), F.col("term").startswith(F.col("prefix"))
                )
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= max_expansions)
                .select("prefix", "term")
                .collect()
            )
            kept: dict[str, set[str]] = {}
            for r in kept_rows:
                kept.setdefault(r["prefix"], set()).add(r["term"])
            for qid, p in prefixes:
                for t in kept.get(p, ()):
                    pairs.add((qid, t))
            return sorted(pairs)
        matched = [r["term"] for r in matched_df.select("term").collect()]
        for qid, p in prefixes:
            for t in matched:
                if t.startswith(p):
                    pairs.add((qid, t))
    return sorted(pairs)


def expand_fuzzy_queries(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
    max_edits: int = 1,
) -> list[tuple[int, str]]:
    """Typo-tolerant expansion: each query term matches every dictionary term
    within `max_edits` Levenshtein distance (the feature Meilisearch builds
    on grenad's sorted-term files). Expansions score as ordinary disjuncts.

    N-GRAM PREFILTER (the 10^9-vocabulary path): a term within 1 edit of a
    query term of length ≥ 4 must share ≥ len(q)-3 ≥ 1 of its character
    bigrams (one edit destroys at most 2 adjacent bigrams), so candidates
    come from the PERSISTED (gram, term) typo index written at build time
    (index.term_bigrams — Meilisearch persists its typo databases the same
    way): the query grams are driver-known, so the scan is gram-IN-pruned
    (parquet min/max on the gram-range-partitioned table) and levenshtein
    runs only on gram-sharing candidates, never on the whole dictionary.
    Query terms shorter than 4 chars (where one edit can destroy every
    bigram) fall back to a length-banded vocabulary scan — a bounded slice,
    and rare in real query logs.

    max_edits == 2 (the SymSpell path): candidates come from the PERSISTED
    (delvar, term) deletion-variant table (index.term_deletes, written at
    build): if lev(q, t) ≤ 2 then some ≤2-char deletion of q equals some
    ≤2-char deletion of t (each edit costs at most one deletion per side),
    so the candidate set is an equi-join of the query's driver-tiny deletion
    neighborhood against the table — delvar IN (…) pruned, NO vocabulary
    scan — followed by an exact levenshtein filter. Indexes built before the
    table existed fall back to the banded scan."""
    from grenad_spark.functions.tokenize import char_bigrams

    qt = _tokenize_queries(queries)
    # ONE-edit expansion against a driver-held vocabulary (df_map, the
    # vocab-gated fast path): the 1-edit neighborhood over the tokenizer
    # alphabet IS the exact lev≤1 string set (vocab terms only contain
    # [a-z0-9]), so generate-and-test against the dict replaces the
    # bigram-join Spark job entirely — ~600 hash lookups per query term,
    # zero jobs. Huge vocabularies (no df map) keep the distributed path.
    if max_edits == 1:
        dfm = index.df_map(spark)
        if dfm is not None:
            return sorted(
                {
                    (q, v)
                    for q, t in qt
                    for v in _edit1_neighborhood(t)
                    if v in dfm
                }
            )
    if max_edits == 2:
        deletes = index.term_deletes(spark)
        if deletes is not None:
            cand = _symspell_candidates(spark, deletes, qt, max_edits)
            return sorted(
                (r["query_id"], r["term"]) for r in cand.collect()
            )
    # the >=1-shared-bigram pigeonhole only holds for ONE edit (an edit kills
    # at most 2 adjacent bigrams); with max_edits >= 2 every term takes the
    # banded-scan path rather than silently dropping valid matches
    gram_ok = max_edits == 1
    long_terms = sorted({(q, t) for q, t in qt if gram_ok and len(t) >= 4})
    # short terms at one edit: GENERATE-AND-TEST — the full 1-edit
    # neighborhood over [a-z0-9] is ≤ ~37·(2l+1) strings (l ≤ 3), so it
    # becomes an In(term, …) point-lookup pushed into the term_dict scan;
    # no vocabulary scan of any kind. max_edits ≥ 2 keeps the banded scan
    # (neighborhood size explodes quadratically; rare path, documented).
    gen_terms = sorted({(q, t) for q, t in qt if gram_ok and len(t) < 4})
    short_terms = sorted({(q, t) for q, t in qt if not gram_ok})
    vocab = index.term_dict(spark).select("term")
    pairs: set[tuple[int, str]] = set()
    band = (F.abs(F.length("term") - F.length("qterm")) <= max_edits) & (
        F.levenshtein("term", "qterm") <= max_edits
    )
    if long_terms:
        qdf = spark.createDataFrame(long_terms, "query_id int, qterm string")
        qgrams = qdf.select(
            "query_id", "qterm", F.explode(char_bigrams(F.col("qterm"))).alias("gram")
        ).distinct()
        # driver-side gram list (bounded by Σ len(qterm)) — pushed into the
        # bigram-table scan as In(gram, …) so only matching files/row-groups
        # are read; MUST be a superset of qgrams' engine-side values (same
        # substr definition, ASCII-only terms)
        gram_list = sorted({t[i : i + 2] for _, t in long_terms for i in range(len(t) - 1)})
        matched = (
            index.term_bigrams(spark)
            .filter(F.col("gram").isin(gram_list))
            .join(F.broadcast(qgrams), "gram")
            .select("query_id", "qterm", "term")
            .distinct()
            .filter(band)
            .select("query_id", "term")
            .distinct()
            .collect()
        )
        pairs.update((r["query_id"], r["term"]) for r in matched)
    if gen_terms:
        cand_rows = [
            (q, v) for q, t in gen_terms for v in _edit1_neighborhood(t)
        ]
        cdf = spark.createDataFrame(
            sorted(set(cand_rows)), "query_id int, term string"
        )
        matched = (
            # the explicit isin is what reaches the parquet scan as
            # In(term, …)/InSet — the broadcast join alone would not push
            # its keys into the scan
            vocab.filter(F.col("term").isin(sorted({v for _, v in cand_rows})))
            .join(F.broadcast(cdf), "term")
            .select("query_id", "term")
            .distinct()
            .collect()
        )
        pairs.update((r["query_id"], r["term"]) for r in matched)
    if short_terms:
        qdf = spark.createDataFrame(short_terms, "query_id int, qterm string")
        matched = (
            vocab.join(F.broadcast(qdf), band)
            .select("query_id", "term")
            .distinct()
            .collect()
        )
        pairs.update((r["query_id"], r["term"]) for r in matched)
    return sorted(pairs)


def _deletes_upto(t: str, d: int) -> set[str]:
    """All strings reachable from t by deleting ≤ d characters (incl. t).
    |result| ≤ 1 + L + L(L−1)/2 at d=2 — driver-tiny per query term."""
    out = {t}
    frontier = {t}
    for _ in range(d):
        nxt = set()
        for s in frontier:
            for i in range(len(s)):
                nxt.add(s[:i] + s[i + 1 :])
        frontier = nxt - out
        out |= nxt
    return out


def _symspell_candidates(
    spark: SparkSession,
    deletes: DataFrame,
    qt: list[tuple[int, str]],
    max_edits: int,
) -> DataFrame:
    """(query_id, term) fuzzy candidates via the persisted deletion table.
    Exposed pre-collect so tests can assert the plan shape: one delvar-IN-
    pruned scan of term_deletes + a broadcast join — term_dict never scanned.
    The deletion-intersection candidate set is a SUPERSET of the true ≤
    max_edits matches (SymSpell guarantee), made exact by the levenshtein
    filter on candidates only."""
    qdel = sorted(
        {
            (q, t, v)
            for q, t in qt
            for v in _deletes_upto(t, max_edits)
        }
    )
    qdf = spark.createDataFrame(qdel, "query_id int, qterm string, delvar string")
    # the explicit isin reaches the parquet scan as In(delvar, …)/InSet —
    # file/row-group pruning on the delvar-range-partitioned table; the
    # broadcast join alone would not push its keys into the scan
    vset = sorted({v for _, _, v in qdel})
    band = (F.abs(F.length("term") - F.length("qterm")) <= max_edits) & (
        F.levenshtein("term", "qterm") <= max_edits
    )
    return (
        deletes.filter(F.col("delvar").isin(vset))
        .join(F.broadcast(qdf), "delvar")
        .select("query_id", "qterm", "term")
        .distinct()
        .filter(band)
        .select("query_id", "term")
        .distinct()
    )


_EDIT_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"


def _edit1_neighborhood(t: str) -> set[str]:
    """All nonempty strings within Levenshtein distance ≤ 1 of t over the
    tokenizer alphabet — |t|·37 + (|t|+1)·36 + 1 strings, driver-tiny for
    the short terms this serves."""
    out = {t}
    for i in range(len(t)):
        d = t[:i] + t[i + 1 :]
        if d:
            out.add(d)  # deletion
        for c in _EDIT_ALPHABET:
            out.add(t[:i] + c + t[i + 1 :])  # substitution
    for i in range(len(t) + 1):
        for c in _EDIT_ALPHABET:
            out.add(t[:i] + c + t[i:])  # insertion
    return out


def search_topk_fuzzy(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
    k: int = 10,
    mode: str = "wand",
    max_edits: int = 1,
) -> DataFrame:
    """Top-k BM25 with Levenshtein-≤max_edits term expansion."""
    pairs = expand_fuzzy_queries(spark, index, queries, max_edits)
    return _search_from_pairs(spark, index, pairs, k, mode)


def conjunctive_matches(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
) -> DataFrame:
    """The FULL conjunctive match set (query_id, doc_id, score), unranked:
    docs containing EVERY query term with their BM25 scores (rounded). The
    building block under AND search and the attribute-ranked /
    distinct-attribute serving variants."""
    pairs = _tokenize_queries(queries)
    n_terms = {}
    for qid, _ in pairs:
        n_terms[qid] = n_terms.get(qid, 0) + 1
    blocks, _ = _query_blocks_from_pairs(spark, index, pairs)
    avgdl = float(index.avgdl)
    codec = index.payload_codec
    nt = spark.createDataFrame(list(n_terms.items()), "query_id int, n_terms int")

    per_shard = blocks.select(
        "query_id", _qshard_col(spark, index), "term", "idf", "n", "first_doc", "last_doc",
        "max_tf", "min_dl", "payload",
    ).transform(lambda _d: _grouped_apply(_d, ["query_id", "shard"], 
        _make_exhaustive_with_termcount(avgdl, codec), _OUT_AND_SCHEMA
    ))
    return (
        per_shard.join(F.broadcast(nt), "query_id")
        .filter(F.col("hit_terms") == F.col("n_terms"))
        .withColumn("score", F.round("score", SCORE_DECIMALS))
        .select("query_id", "doc_id", "score")
    )


def search_conjunctive(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
    k: int = 10,
) -> DataFrame:
    """AND semantics: only docs containing EVERY query term rank (the
    posting-list intersection of SURVEY §2.7; relationally a semi-join chain,
    here one aggregate with a term-count filter)."""
    matches = conjunctive_matches(spark, index, queries)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        matches.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .select("query_id", "doc_id", "score")
    )


def search_topk_words(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
    k: int = 10,
) -> DataFrame:
    """The Meilisearch WORDS ranking rule (its first-priority rule): docs
    matching MORE distinct query terms rank first; BM25 then doc_id break
    ties. (query_id, doc_id, hit_terms, score). Same plan as the AND path —
    the per-shard kernel already counts matched terms — minus the
    all-terms-required filter."""
    pairs = _tokenize_queries(queries)
    blocks, _ = _query_blocks_from_pairs(spark, index, pairs)
    avgdl = float(index.avgdl)
    codec = index.payload_codec
    per_shard = blocks.select(
        "query_id", _qshard_col(spark, index), "term", "idf", "n", "first_doc", "last_doc",
        "max_tf", "min_dl", "payload",
    ).transform(lambda _d: _grouped_apply(_d, ["query_id", "shard"], 
        _make_exhaustive_with_termcount(avgdl, codec), _OUT_AND_SCHEMA
    ))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("hit_terms"), F.desc("score"), F.asc("doc_id")
    )
    return (
        per_shard.withColumn("score", F.round("score", SCORE_DECIMALS))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .select("query_id", "doc_id", "hit_terms", "score")
    )


def search_topk_sorted(
    spark: SparkSession,
    index: IndexHandle,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    sort_col: str,
    k: int = 10,
    ascending: bool = False,
) -> DataFrame:
    """Meilisearch SORTABLE-ATTRIBUTE serving: conjunctive matches ranked by
    a document attribute (sort_col) instead of relevance; BM25 score rides
    along, doc_id breaks ties. (query_id, doc_id, <sort_col>, score).

    Scale: the attribute join is doc_id-keyed against the documents table
    (co-partitionable; AQE broadcasts the match side when a rare query makes
    it small); ranking is the standard per-query window. Meilisearch serves
    this from its facet_id_f64_docids grenad database — here the attribute
    lives in the documents table and the match set comes from the index."""
    matches = conjunctive_matches(spark, index, queries)
    j = matches.join(docs.select("doc_id", sort_col), "doc_id")
    key = F.asc(sort_col) if ascending else F.desc(sort_col)
    w = Window.partitionBy("query_id").orderBy(key, F.asc("doc_id"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .select("query_id", "doc_id", sort_col, "score")
    )


def search_topk_distinct_attr(
    spark: SparkSession,
    index: IndexHandle,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    distinct_col: str,
    k: int = 10,
) -> DataFrame:
    """Meilisearch DISTINCT-ATTRIBUTE serving: at most ONE result per
    distinct_col value — the best-scoring doc of each group — then the
    global top-k by score. (query_id, doc_id, <distinct_col>, score).
    Two windows: rank-1 per (query, attribute-value), then the per-query
    top-k; both partition-pruned by query_id."""
    matches = conjunctive_matches(spark, index, queries)
    j = matches.join(docs.select("doc_id", distinct_col), "doc_id")
    w_grp = Window.partitionBy("query_id", distinct_col).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    best = j.withColumn("grn", F.row_number().over(w_grp)).filter(F.col("grn") == 1)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        best.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .select("query_id", "doc_id", distinct_col, "score")
    )


_OUT_AND_SCHEMA = "query_id int, doc_id long, score double, hit_terms int"


def _make_exhaustive_with_termcount(avgdl: float, codec: str = "none"):
    """Like the exhaustive scorer but emits per-doc matched-term counts and
    does NOT truncate to k (the AND filter happens before ranking)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        doc_parts, score_parts = [], []
        for (_, idf), g in pdf.groupby(["term", "idf"], sort=False):
            d, tf, dl = decode_block_rows(
                decompress_payloads(list(g["payload"]), codec), g["n"].to_numpy()
            )
            s = float(idf) * _tfpart(tf.astype(np.float64), dl.astype(np.float64), avgdl)
            doc_parts.append(d)
            score_parts.append(s)
        if not doc_parts:
            return pd.DataFrame(
                {
                    "query_id": pd.Series(dtype="int32"),
                    "doc_id": pd.Series(dtype="int64"),
                    "score": pd.Series(dtype="float64"),
                    "hit_terms": pd.Series(dtype="int32"),
                }
            )
        docs = np.concatenate(doc_parts)
        scores = np.concatenate(score_parts)
        uniq, inv = np.unique(docs, return_inverse=True)
        agg = np.zeros(uniq.size)
        np.add.at(agg, inv, scores)
        hits = np.zeros(uniq.size, dtype=np.int64)
        np.add.at(hits, inv, 1)
        return pd.DataFrame(
            {"query_id": qid, "doc_id": uniq, "score": agg, "hit_terms": hits}
        )

    return fn


DEFAULT_MAX_EXPANSIONS = 128  # Meilisearch-style serving cap: a 1-char
# prefix against a web vocabulary expands to millions of terms — serving
# defaults to the top-df 128 per prefix; pass None for exhaustive expansion


def search_topk_prefix(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
    k: int = 10,
    mode: str = "wand",
    max_expansions: int | None = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """Top-k BM25 where query terms may end in `*` (prefix expansion).
    max_expansions caps each prefix to its highest-df expansions (None =
    uncapped, exact — what the contract query runs on the small vocab)."""
    pairs = expand_prefix_queries(spark, index, queries, max_expansions)
    return _search_from_pairs(spark, index, pairs, k, mode)


def _query_blocks(
    spark: SparkSession, index: IndexHandle, queries: list[tuple[int, str]]
) -> tuple[DataFrame, DataFrame]:
    """Pruned (query_id × matching block rows) with idf attached.

    Returns (blocks_df, qterms_df). df (hence idf) comes from term_dict —
    a broadcast join of at most |query terms| rows.
    """
    return _query_blocks_from_pairs(spark, index, _tokenize_queries(queries))


def _attach_query_terms(seg: DataFrame, rows: list[tuple[int, str, float]]) -> DataFrame:
    """Fan block rows out per query and attach idf WITHOUT a join.

    rows = driver-resolved (query_id, term, idf). Builds two literal-map
    expressions — term → array<query_id> and term → idf — and applies them
    as a map lookup + explode. Equivalent to the inner broadcast join on
    term (NULL lookups are dropped by explode), but stays inside one
    whole-stage-codegen stage: no broadcast exchange, no relation build,
    no extra job. Literal size is bounded by the batch's distinct query
    terms (tens of entries), so the plan stays small."""
    qids: dict[str, list[int]] = {}
    idfs: dict[str, float] = {}
    for q, t, i in rows:
        qids.setdefault(t, []).append(int(q))
        idfs[t] = float(i)
    qid_map = F.create_map(
        *[
            x
            for t, qs in qids.items()
            for x in (F.lit(t), F.array(*[F.lit(q) for q in qs]))
        ]
    )
    idf_map = F.create_map(
        *[x for t, i in idfs.items() for x in (F.lit(t), F.lit(i))]
    )
    return seg.withColumn("query_id", F.explode(qid_map[F.col("term")])).withColumn(
        "idf", idf_map[F.col("term")]
    )


def _query_blocks_from_pairs(
    spark: SparkSession,
    index: IndexHandle,
    qt: list[tuple[int, str]],
    columns: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Pruned (query_id × matching block rows) with idf attached.

    Fast path: the handle's driver-held df map (vocabulary-gated) computes
    idf locally and ships it INSIDE the qterms broadcast — one Spark job per
    query instead of two (no term_dict scan). Fallback for 10^9-term vocabs:
    broadcast join against term_dict. columns restricts the segment scan
    (the metadata prune pass reads everything BUT the payload — parquet
    column pruning keeps payload bytes on disk)."""
    terms = sorted({t for _, t in qt})
    seg = index.segments(spark).filter(F.col("term").isin(terms))
    if columns is not None:
        seg = seg.select(*columns)
    n_docs = float(index.n_docs)
    dfm = index.df_map(spark)
    if dfm is not None:
        rows = [
            (q, t, _driver_idf(n_docs, dfm[t]))
            for q, t in qt
            if t in dfm
        ]
        if rows:
            # (query_id, idf) attach via LITERAL MAP expressions instead of a
            # broadcast hash join: building + shipping even a one-row
            # broadcast relation costs ~0.2 s per job (measured — it was the
            # single largest piece of single-query latency), while a literal
            # map lookup + explode is pure whole-stage-codegen work on the
            # already-pruned scan. Terms absent from the map yield NULL →
            # explode drops the row, exactly like the inner join it replaces.
            blocks = _attach_query_terms(seg, rows)
            return blocks, None
        qterms = spark.createDataFrame(rows, "query_id int, term string, idf double")
        blocks = seg.join(F.broadcast(qterms), "term")
        return blocks, qterms
    qterms = spark.createDataFrame(qt, "query_id int, term string")
    td = index.term_dict(spark).filter(F.col("term").isin(terms)).select("term", "df")
    blocks = (
        seg.join(F.broadcast(td), "term")
        .join(F.broadcast(qterms), "term")
        .withColumn(
            "idf", F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
        )
    )
    return blocks, qterms


_OUT_SCHEMA = "query_id int, doc_id long, score double"


def search_topk(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
    k: int = 10,
    mode: str = "exhaustive",
) -> DataFrame:
    """Top-k BM25 over the index. mode: 'exhaustive' | 'wand'.

    Both modes return identical results (asserted in tests/test_search.py);
    wand skips decoding blocks whose upper bound can't reach the running
    top-k threshold.
    """
    return _search_from_pairs(spark, index, _tokenize_queries(queries), k, mode)


def _range_survivors(
    rterms: list[dict], theta: float
) -> tuple[np.ndarray, np.ndarray]:
    """(sur_starts, sur_ends): block-boundary-aligned doc ranges whose summed
    covering-block upper bounds can reach θ − PRUNE_EPS. THE shared range
    machinery of both pruning tiers (in-UDF phase 2 and the pass-1 metadata
    pruner) — the off-by-one-prone searchsorted idioms the exactness proof
    rests on live exactly once. Each rterm needs sorted doc-disjoint
    (first, last, ub) arrays; sparse terms pass exact unit pseudo-blocks.

    >= (not >) against θ − PRUNE_EPS: a pruned doc with UB == θ could
    otherwise tie the kth ROUNDED score and deserve the slot by doc_id —
    ties must stay exact (final ranking rounds to SCORE_DECIMALS)."""
    bounds = np.unique(
        np.concatenate([t["first"] for t in rterms] + [t["last"] + 1 for t in rterms])
    )
    if bounds.size < 2:  # unreachable for nonempty blocks (last+1 > first)
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    rstarts = bounds[:-1]
    range_ub = np.zeros(rstarts.size)
    for t in rterms:
        # block covering each range start (blocks are doc-disjoint, sorted):
        # idx of first block with last >= start
        bi = np.searchsorted(t["last"], rstarts)
        valid = bi < t["first"].size
        bi_c = np.minimum(bi, t["first"].size - 1)
        covers = valid & (t["first"][bi_c] <= rstarts)
        range_ub[covers] += t["ub"][bi_c[covers]]
    survive = range_ub >= theta - PRUNE_EPS
    return rstarts[survive], bounds[1:][survive]


def _overlap_mask(t: dict, sur_starts: np.ndarray, sur_ends: np.ndarray) -> np.ndarray:
    """Per-block bool mask: does any surviving range overlap the block?"""
    if sur_starts.size == 0:
        return np.zeros(t["first"].size, dtype=bool)
    i = np.searchsorted(sur_ends, t["first"], side="right")
    return (i < sur_starts.size) & (
        sur_starts[np.minimum(i, sur_starts.size - 1)] <= t["last"]
    )


def _est_postings(
    spark: SparkSession, index: IndexHandle, pairs: list[tuple[int, str]]
) -> int | None:
    """Σ df over the batch's (query, term) pairs from the driver df map —
    the posting volume the scoring exchange will carry (each pair ships its
    term's blocks once per referencing query). None on huge vocabularies
    (no df map) — callers then fall back to core-count-sized groups."""
    dfm = index.df_map(spark)
    if dfm is None:
        return None
    return sum(dfm.get(t, 0) for _, t in pairs)


def _group_params(
    spark: SparkSession,
    index: IndexHandle,
    n_queries: int,
    est_postings: int | None = None,
) -> tuple[int, int, int]:
    """(g, n_groups, n_qshards) for the scoring shuffle.

    QUERY-SIDE SHARD COALESCING: build-side shards are sized for skew-bounded
    encode groups (docs_per_shard), which can be far more groups than query
    cores. Consecutive shards are doc-range DISJOINT and ascending, so
    merging g of them per scoring group preserves exactness (the group is
    still one valid posting-list slice), widens WAND's pruning scope, and
    cuts per-group Python overhead by g×. n_groups right-sizes the explicit
    shuffle INTO the groups: the serving job's data is query-terms-only block
    rows (KBs-MBs), so the default shuffle.partitions-wide exchange is pure
    task-scheduling overhead. HashPartitioning(query_id, qshard) satisfies
    applyInPandas's clustering requirement, so Catalyst inserts NO second
    exchange."""
    g, n_qshards = _qshard_params(spark, index, est_postings)
    n_groups = max(1, min(
        max(1, spark.sparkContext.defaultParallelism), n_queries * n_qshards
    ))
    return g, n_groups, n_qshards


def _rank_topk(per_shard: DataFrame, n_queries: int, kk: int) -> DataFrame:
    rounded = per_shard.withColumn("score", F.round("score", SCORE_DECIMALS))
    if n_queries == 1:
        # single-query serving: ORDER BY + LIMIT compiles to
        # TakeOrderedAndProject — no window exchange, the k·shards candidate
        # rows reduce driver-side in the same job
        return (
            rounded.orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(kk)
            .select("query_id", "doc_id", "score")
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        rounded.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= kk)
        .select("query_id", "doc_id", "score")
    )


def _make_per_query(apply_fn):
    """Wrap a one-query kernel so it serves a whole qshard group: sort by
    query_id once, slice per query, run the kernel per slice. Grouping the
    shuffle by qshard ONLY (queries loop inside) cuts the per-group pandas
    construction from |queries|·|qshards| Arrow→pandas groups to |qshards| —
    measured ~0.3 s of a 0.9 s 12-query batch. Results are identical: each
    slice is exactly the (query, qshard) group the kernel saw before."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return _empty_out()
        pdf = pdf.sort_values("query_id", kind="stable")
        q_np = pdf["query_id"].to_numpy()
        qstarts = np.concatenate(
            ([0], np.flatnonzero(q_np[1:] != q_np[:-1]) + 1, [q_np.size])
        )
        outs = []
        for qi in range(qstarts.size - 1):
            out = apply_fn(pdf.iloc[int(qstarts[qi]) : int(qstarts[qi + 1])])
            if len(out):
                outs.append(out)
        return pd.concat(outs, ignore_index=True) if outs else _empty_out()

    return fn


def _grouped_apply(
    df: DataFrame,
    keys: list[str],
    fn,
    out_schema: str,
    n_part: int | None = None,
    slice_groups: bool = True,
) -> DataFrame:
    """groupBy(*keys).applyInPandas(fn, out_schema), built on mapInPandas.

    Spark's grouped-map Arrow protocol costs ~125 ms/job more than the plain
    map protocol on identical data (measured on a one-partition single-query
    plan: identity applyInPandas 430 ms vs identity mapInPandas 305 ms — the
    pandas conversion itself is NOT the cost). This helper keeps the exact
    per-group semantics: hash-repartition on the keys (coalesce(1) when one
    group — a narrow merge, no exchange), concatenate each partition's Arrow
    batches, slice per distinct key combination (stable lexsort + boundary
    scan), and call `fn` once per slice — the same (columns incl. keys,
    multiset of rows) every applyInPandas group saw.

    slice_groups=False skips the per-key slicing and hands `fn` the whole
    concatenated partition in one call. Only valid for kernels that (a) do
    their own per-query slicing internally and (b) treat their input as an
    arbitrary doc-disjoint slice of the index — true for the qshard-keyed
    scoring/prune kernels (qshards are doc-range disjoint, so a partition
    holding several of them is just a coarser qshard). Merging gives the
    kernel a wider pruning scope and fewer Python invocations — measured
    another ~15% off a 12-query wand batch vs per-qshard slices.

    Memory: a task holds its whole partition instead of one group at a time;
    inputs here are query-term block rows whose volume per partition is
    bounded by (batch posting volume) / n_part — the same sizing rule
    (_qshard_params) that bounded per-group memory before."""
    if n_part is None:
        n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    part = df.coalesce(1) if n_part == 1 else df.repartition(n_part, *keys)

    def mfn(batches):
        pdfs = [p for p in batches]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        if not len(pdf):
            return
        if not slice_groups:
            out = fn(pdf)
            if out is not None and len(out):
                yield out
            return
        arrs = [pdf[c].to_numpy() for c in keys]
        order = np.lexsort(arrs[::-1])
        pdf = pdf.take(order)
        arrs = [a[order] for a in arrs]
        if len(pdf) > 1:
            change = np.zeros(len(pdf) - 1, dtype=bool)
            for a in arrs:
                change |= a[1:] != a[:-1]
            starts = np.concatenate(([0], np.flatnonzero(change) + 1, [len(pdf)]))
        else:
            starts = np.array([0, len(pdf)])
        outs = []
        for i in range(starts.size - 1):
            out = fn(pdf.iloc[int(starts[i]) : int(starts[i + 1])])
            if out is not None and len(out):
                outs.append(out)
        if outs:
            yield pd.concat(outs, ignore_index=True) if len(outs) > 1 else outs[0]

    return part.mapInPandas(mfn, out_schema)


def _search_from_pairs(
    spark: SparkSession,
    index: IndexHandle,
    pairs: list[tuple[int, str]],
    k: int = 10,
    mode: str = "exhaustive",
) -> DataFrame:
    if mode == "wand_pruned":
        return _search_pruned(spark, index, pairs, k)
    blocks, _ = _query_blocks_from_pairs(spark, index, pairs)
    avgdl = float(index.avgdl)
    kk = int(k)
    codec = index.payload_codec

    if mode == "exhaustive":
        apply_fn = _make_exhaustive(avgdl, kk, codec)
    elif mode == "wand":
        apply_fn = _make_wand_batched(avgdl, kk, codec)
    elif mode == "wand_cursor":
        apply_fn = _make_wand(avgdl, kk, codec)
    else:
        raise ValueError(f"unknown mode {mode!r}")

    n_queries = len({q for q, _ in pairs})
    g, n_groups, n_qshards = _group_params(
        spark, index, n_queries, _est_postings(spark, index, pairs)
    )
    sel = blocks.select(
        "query_id",
        (F.col("shard") / g).cast("int").alias("qshard"),
        "term", "idf", "n", "first_doc", "last_doc",
        "max_tf", "min_dl", "payload",
    )
    n_part = min(n_groups, n_qshards)
    # _grouped_apply: map-protocol kernel dispatch (~125 ms/job cheaper than
    # grouped applyInPandas); at n_part == 1 the narrow coalesce keeps the
    # whole query in ONE stage — no exchange at all
    per_shard = _grouped_apply(
        sel, ["qshard"], _make_per_query(apply_fn), _OUT_SCHEMA, n_part,
        slice_groups=False,
    )
    return _rank_topk(per_shard, n_queries, kk)


# metadata prune pass: every block column EXCEPT payload (parquet column
# pruning keeps the payload bytes on disk for pass 1)
_META_COLS = [
    "term", "shard", "block_id", "n", "first_doc", "last_doc",
    "max_tf", "min_dl", "min_tf", "max_dl",
]
_SURVIVOR_SCHEMA = "query_id int, term string, shard int, block_id int"


def _search_pruned(
    spark: SparkSession,
    index: IndexHandle,
    pairs: list[tuple[int, str]],
    k: int = 10,
    survivors: DataFrame | None = None,
) -> DataFrame:
    """TWO-PASS serving: prune blocks from METADATA before any payload
    crosses the shuffle (the top r2 scale item — BASELINE.md measured that
    payload shuffle duplication dominates serving at scale).

    Pass 1 ships only block metadata (~30 B/block vs KB payloads) into the
    per-(query, qshard) groups, computes a metadata-only θ lower bound and
    the surviving block set (see _make_meta_prune). Pass 2 joins the
    survivors back against the segment table — AQE broadcasts the survivor
    list when pruning bites, so ONLY surviving payloads cross the exchange
    into the scoring UDF (which is the standard batched block-max WAND and
    re-derives its own tighter decoded θ on the surviving subset). Shuffled
    payload bytes become ∝ survivors instead of ∝ all query-term blocks —
    grenad's seek-never-reads-non-matching-blocks contract
    (src/reader/reader_cursor.rs:184-209) applied to the exchange.

    Exactness: θ_meta ≤ true kth score, so dropped blocks lie only in ranges
    whose total upper bound is below θ_meta − PRUNE_EPS — their docs can't
    enter the top-k even on a rounded tie, and a doc partially decoded from
    a surviving block that straddles a dead range scores ≤ its full score
    < θ_meta − PRUNE_EPS, so it can't displace anything either (same
    argument as the in-UDF range mask, asserted in tests/test_wand_property
    and the bm25_topk_wand_pruned contract gate).

    Pre-v2 indexes (no min_tf/max_dl block metadata) fall back to the
    single-pass wand plan."""
    if "min_tf" not in index.segments(spark).columns:
        return _search_from_pairs(spark, index, pairs, k, "wand")
    kk = int(k)
    avgdl = float(index.avgdl)
    codec = index.payload_codec
    n_queries = len({q for q, _ in pairs})
    g, n_groups, n_qshards = _group_params(
        spark, index, n_queries, _est_postings(spark, index, pairs)
    )

    # survivor attach: a SUPERSET of the pass-1 survivors is always exact —
    # the scoring kernel re-derives its own θ and extra blocks only add
    # correctly-scored candidates — so a small survivor set collects to the
    # driver and comes back as ONE packed-key SQL IN literal (hashed InSet,
    # no broadcast build/ship, no join). The packed key drops the term
    # (query_id·2⁴⁰ + shard·2²⁰ + block_id): a colliding block of another
    # query term ships too, which is exactly the harmless-superset case.
    # Oversized survivor sets (or out-of-range components) keep the
    # broadcast hash join — AQE alone would cost stage barriers
    # (~0.5 s/batch measured). When a corpus/query mix prunes nothing,
    # callers should serve with mode='wand' instead — or search_topk_auto.
    if survivors is None:
        survivors = survivor_blocks(spark, index, pairs, kk)
    blocks, _ = _query_blocks_from_pairs(spark, index, pairs)
    # pass 1 materializes exactly ONCE (eager localCheckpoint — the
    # search_topk_auto pattern); the attach then adapts: a SMALL survivor
    # set collects and comes back as one packed-key SQL IN literal (hashed
    # InSet, no broadcast build/ship, no join; supersets are exact — the
    # kernel re-derives θ), larger sets broadcast the checkpointed rows
    # (no recompute). The literal cap is ANALYSIS-bound: a 33k-element IN
    # built 33k literal tree nodes before the InSet conversion and doubled
    # the batch (measured) — small sets only.
    pruned = None
    bs = int(index.manifest.get("block_size") or 128)
    dfm = index.df_map(spark)
    est_blocks = (
        sum(-(-dfm[t] // bs) for q, t in set(pairs) if t in dfm)
        if dfm is not None
        else None
    )
    if (
        est_blocks is not None
        and est_blocks <= 2048
        and int(index.n_shards) < (1 << 20)
    ):
        # the upper bound on survivors is already literal-sized, so pass 1
        # materializes via ONE collect and comes back as the packed-key IN
        srows = survivors.select("query_id", "shard", "block_id").collect()
        if not srows:
            return spark.createDataFrame([], _OUT_SCHEMA)
        if all(
            0 <= r["query_id"] < (1 << 23) and 0 <= r["block_id"] < (1 << 20)
            for r in srows
        ):
            keys = sorted(
                {
                    (int(r["query_id"]) << 40)
                    | (int(r["shard"]) << 20)
                    | int(r["block_id"])
                    for r in srows
                }
            )
            pruned = blocks.filter(
                F.expr(
                    "shiftleft(CAST(query_id AS BIGINT), 40) + "
                    "shiftleft(CAST(shard AS BIGINT), 20) + block_id IN "
                    f"({','.join(map(str, keys))})"
                )
            )
    if pruned is None:
        # big/unknown survivor sets: the original lazy broadcast — pass 1
        # runs once inside the broadcast build, zero extra jobs
        pruned = blocks.join(
            F.broadcast(survivors), ["query_id", "term", "shard", "block_id"]
        )
    per_shard = _grouped_apply(
        pruned.select(
            "query_id",
            (F.col("shard") / g).cast("int").alias("qshard"),
            "term", "idf", "n", "first_doc", "last_doc",
            "max_tf", "min_dl", "payload",
        ),
        ["qshard"],
        _make_per_query(_make_wand_batched(avgdl, kk, codec)),
        _OUT_SCHEMA,
        min(n_groups, n_qshards),
        slice_groups=False,
    )
    return _rank_topk(per_shard, n_queries, kk)


# a query term is SPARSE when its whole posting list is comparable in size
# to the metadata stream — its payloads ride INTO pass 1 (still tiny) and get
# decoded there, turning its block-span upper bound into EXACT per-posting
# positions. Without this, a rare term's block spans nearly the entire doc
# range (164 postings spread over a shard) and its UB resurrects every range
# it covers — measured 100% survivors on the zipf bench. With it, ranges
# between rare postings carry zero rare mass and die: dense blocks survive
# only around actual rare-doc positions (the MaxScore essential-list
# economics, computed in one metadata pass).
SPARSE_DF_MAX = 65536


def survivor_blocks(
    spark: SparkSession,
    index: IndexHandle,
    pairs: list[tuple[int, str]],
    k: int,
    sparse_df_max: int = SPARSE_DF_MAX,
) -> DataFrame:
    """Pass-1 survivor set: (query_id, term, shard, block_id) of every block
    whose payload must cross the shuffle for an exact top-k. Public so the
    bench can report |survivors| / |query-term blocks| — the shuffled-bytes
    pruning ratio the two-pass plan exists for.

    Low-df (sparse) query terms contribute their PAYLOADS to the metadata
    pass (bounded by sparse_df_max postings per term); high-df terms ship
    metadata only. Requires the driver df map for the sparse split; falls
    back to pure metadata without it."""
    avgdl = float(index.avgdl)
    n_queries = len({q for q, _ in pairs})
    g, n_groups, n_qshards = _group_params(
        spark, index, n_queries, _est_postings(spark, index, pairs)
    )
    dfm = index.df_map(spark)
    if dfm is not None:
        # DISTINCT-BLOCK pass 1: resolve the query structure driver-side
        # (terms per query + idf per term) and ship each block's metadata
        # once — the per-query fan-out would multiply the exchange by the
        # number of referencing queries (64× for the zipf batch's common
        # terms). The kernel rebuilds per-query views and runs the same
        # _prune_query_entries math as the fanned-out path.
        terms_by_q: dict[int, list[str]] = {}
        for q, t in pairs:
            if t in dfm:
                terms_by_q.setdefault(q, []).append(t)
        all_terms = sorted({t for ts in terms_by_q.values() for t in ts})
        if not all_terms:
            return spark.createDataFrame([], _SURVIVOR_SCHEMA)
        n_docs = float(index.n_docs)
        idfs = {t: _driver_idf(n_docs, dfm[t]) for t in all_terms}
        sparse_terms = sorted(t for t in all_terms if dfm[t] <= sparse_df_max)
        dense_terms = sorted(t for t in all_terms if dfm[t] > sparse_df_max)
        seg = index.segments(spark)
        meta = None
        if dense_terms:
            meta = (
                seg.filter(F.col("term").isin(dense_terms))
                .select(*_META_COLS)
                .withColumn("payload", F.lit(None).cast("binary"))
            )
        if sparse_terms:
            ms = seg.filter(F.col("term").isin(sparse_terms)).select(
                *_META_COLS, "payload"
            )
            meta = ms if meta is None else meta.unionByName(ms)
        return _grouped_apply(
            meta.select(
                (F.col("shard") / g).cast("int").alias("qshard"),
                *_META_COLS,
                "payload",
            ),
            ["qshard"],
            _make_meta_prune_shared(
                terms_by_q, idfs, avgdl, int(k), index.payload_codec
            ),
            _SURVIVOR_SCHEMA,
            min(n_groups, n_qshards),
            slice_groups=False,
        )
    sparse = {
        t for _, t in pairs if dfm is not None and dfm.get(t, 1 << 62) <= sparse_df_max
    }
    sparse_pairs = [(q, t) for q, t in pairs if t in sparse]
    dense_pairs = [(q, t) for q, t in pairs if t not in sparse]
    if not sparse_pairs and not dense_pairs:
        return spark.createDataFrame([], _SURVIVOR_SCHEMA)
    meta = None
    if dense_pairs:
        md, _ = _query_blocks_from_pairs(spark, index, dense_pairs, columns=_META_COLS)
        meta = md.withColumn("payload", F.lit(None).cast("binary"))
    if sparse_pairs:
        ms, _ = _query_blocks_from_pairs(
            spark, index, sparse_pairs, columns=_META_COLS + ["payload"]
        )
        meta = ms if meta is None else meta.unionByName(ms)
    # grouped by qshard ONLY (queries loop inside the UDF): the prune math
    # is a few hundred numpy ops per query, so per-(query, qshard) groups
    # would pay ~batch_size× more pandas group overhead than compute —
    # measured 3× wall-clock on a 64-query batch. Metadata volume per qshard
    # group is (batch's query-term blocks)/n_qshards — small by construction.
    return _grouped_apply(
        meta.select(
            "query_id",
            (F.col("shard") / g).cast("int").alias("qshard"),
            "term", "shard", "block_id", "idf", "n", "first_doc", "last_doc",
            "max_tf", "min_dl", "min_tf", "max_dl", "payload",
        ),
        ["qshard"],
        _make_meta_prune(avgdl, int(k), index.payload_codec),
        _SURVIVOR_SCHEMA,
        min(n_groups, n_qshards),
        slice_groups=False,
    )


def search_topk_auto(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
    k: int = 10,
    prune_ratio_max: float = 0.5,
) -> DataFrame:
    """Serving entry that PICKS the plan per batch instead of asking the
    caller to know their corpus: run pass 1 (metadata-sized), measure
    |survivors| / |query-term blocks|, then either finish the two-pass plan
    with the already-computed survivor set (pruning bit — shuffle ∝
    survivors) or fall back to single-pass WAND (it didn't — a second
    metadata pass would only add cost). Pass-1 work is REUSED by pass 2 via
    an eager localCheckpoint (one materialization, nothing left cached);
    the denominator comes from term_dict's per-term n_blocks — a
    vocabulary-pruned lookup of |query terms| rows, not a metadata rescan.
    Pre-v2 indexes serve single-pass directly."""
    pairs = _tokenize_queries(queries)
    if "min_tf" not in index.segments(spark).columns:
        return _search_from_pairs(spark, index, pairs, k, "wand")
    surv = survivor_blocks(spark, index, pairs, int(k)).localCheckpoint()
    n_surv = surv.count()
    terms = sorted({t for _, t in pairs})
    nb = {
        r["term"]: int(r["n_blocks"])
        for r in index.term_dict(spark)
        .filter(F.col("term").isin(terms))
        .select("term", "n_blocks")
        .collect()
    }
    total = sum(nb.get(t, 0) for _, t in pairs)
    if total > 0 and n_surv <= prune_ratio_max * total:
        return _search_pruned(spark, index, pairs, k, survivors=surv)
    return _search_from_pairs(spark, index, pairs, k, "wand")


def _make_meta_prune(avgdl: float, k: int, codec: str = "none"):
    """Pass-1 UDF: surviving (term, shard, block_id) of one (query, qshard)
    group. Input is block METADATA for dense terms; sparse (low-df) terms
    additionally carry their payloads (tiny by the sparse_df_max bound).

    θ is the max of two valid lower bounds on the group's kth-best FULL
    score:
    - θ_meta (dense terms): each block guarantees every one of its docs
      scores at least lb = idf · tfpart(min_tf, max_dl) from that term alone
      (tfpart is increasing in tf, decreasing in dl — the dual of the
      block-max UPPER bound). Accumulate a term's blocks in descending-lb
      order until they hold ≥ k docs (distinct within a term); the last
      accepted lb bounds the kth-best score from below.
    - θ_seed (sparse terms): decode the sparse payloads and aggregate each
      doc's EXACT sparse-term contribution; the kth-largest partial score is
      ≤ the kth-best full score whenever ≥ k docs exist.

    Range analysis (as in _make_wand_batched phase 2, block boundaries →
    covering-block UB sums), with the sparse refinement: a decoded sparse
    posting contributes its EXACT score at exactly its own doc position
    (a unit-width pseudo-block) instead of a block-span UB — so ranges
    between sparse postings carry zero sparse mass and die when the dense
    UBs alone can't reach θ. A dense block survives iff it overlaps a
    surviving range; sparse blocks always ship (they are the small side).
    θ = −1 (no bound available) keeps everything — never lossy."""
    # snapshot the A/B toggle at PLAN time (driver): _prune_one_query is a
    # top-level function — workers import it by reference and would read the
    # module DEFAULT, not the driver's setting; a closure variable is
    # pickled by value and travels with the plan
    cross_term = CROSS_TERM_THETA

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int32"),
                "term": pd.Series(dtype="object"),
                "shard": pd.Series(dtype="int32"),
                "block_id": pd.Series(dtype="int32"),
            }
        )
        if len(pdf) == 0:
            return empty
        # one qshard group holds EVERY query of the batch: sort once, slice
        # per query, run the prune per slice (decoded sparse payloads are
        # cached across queries sharing a (term, shard, block) — common in
        # real batches)
        pdf = pdf.sort_values(["query_id", "term", "first_doc"], kind="stable")
        q_np = pdf["query_id"].to_numpy()
        qstarts = np.concatenate(
            ([0], np.flatnonzero(q_np[1:] != q_np[:-1]) + 1, [q_np.size])
        )
        decoded_cache: dict = {}
        outs = []
        for qi in range(qstarts.size - 1):
            out = _prune_one_query(
                pdf.iloc[int(qstarts[qi]) : int(qstarts[qi + 1])],
                avgdl, k, codec, decoded_cache, empty, cross_term,
            )
            if len(out):
                outs.append(out)
        return pd.concat(outs, ignore_index=True) if outs else empty

    return fn


def _make_meta_prune_shared(
    terms_by_q: dict[int, list[str]],
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    codec: str = "none",
):
    """Pass-1 kernel over DISTINCT block rows (no per-query fan-out): the
    exchange ships each block's metadata ONCE (≈ |blocks| rows instead of
    |queries| × |blocks| — 64× less on the zipf batch, where two common
    terms appear in every query), and the per-query views are reconstructed
    here from the driver-known query structure, exactly like the
    shared-decode scorer. Per-term entries (incl. the sparse decode) are
    built once per partition and shared across every query that uses the
    term; the per-query θ/range/emit math is _prune_query_entries — the
    same function the fanned-out kernel calls, so the two plans cannot
    drift."""
    cross_term = CROSS_TERM_THETA

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int32"),
                "term": pd.Series(dtype="object"),
                "shard": pd.Series(dtype="int32"),
                "block_id": pd.Series(dtype="int32"),
            }
        )
        if len(pdf) == 0:
            return empty
        pdf = pdf.sort_values(["term", "first_doc"], kind="stable")
        t_np = pdf["term"].to_numpy()
        first_np = pdf["first_doc"].to_numpy()
        last_np = pdf["last_doc"].to_numpy()
        ns_np = pdf["n"].to_numpy()
        shard_np = pdf["shard"].to_numpy()
        bid_np = pdf["block_id"].to_numpy()
        pay_np = pdf["payload"].to_numpy()
        max_tf = pdf["max_tf"].to_numpy().astype(np.float64)
        min_dl = pdf["min_dl"].to_numpy().astype(np.float64)
        min_tf = pdf["min_tf"].to_numpy().astype(np.float64)
        max_dl = pdf["max_dl"].to_numpy().astype(np.float64)
        starts = np.concatenate(
            ([0], np.flatnonzero(t_np[1:] != t_np[:-1]) + 1, [t_np.size])
        )
        entries: dict[str, dict] = {}
        for si in range(starts.size - 1):
            s, e = int(starts[si]), int(starts[si + 1])
            term = t_np[s]
            idf = float(idfs[term])
            entry = {
                "term": term,
                "shard": shard_np[s:e],
                "bid": bid_np[s:e],
            }
            if pay_np[s] is not None:
                d, tf, dl = decode_block_rows(
                    decompress_payloads(list(pay_np[s:e]), codec), ns_np[s:e]
                )
                c = idf * _tfpart(
                    tf.astype(np.float64), dl.astype(np.float64), avgdl
                )
                entry["first"] = d
                entry["last"] = d
                entry["ub"] = c
                entry["lb"] = c
                entry["nb"] = np.ones(d.size, dtype=np.int64)
                entry["sparse"] = True
            else:
                lb = idf * _tfpart(min_tf[s:e], max_dl[s:e], avgdl)
                entry["first"] = first_np[s:e]
                entry["last"] = last_np[s:e]
                entry["ub"] = idf * _tfpart(max_tf[s:e], min_dl[s:e], avgdl)
                entry["lb"] = lb
                entry["nb"] = ns_np[s:e]
                entry["sparse"] = False
                entry["theta_cand"] = _dense_theta_cand(lb, ns_np[s:e], k)
            entries[term] = entry
        outs = []
        for qid, qterms in sorted(terms_by_q.items()):
            terms = []
            sparse_terms = []
            for t in sorted(set(qterms)):
                ent = entries.get(t)
                if ent is None:
                    continue
                (sparse_terms if ent["sparse"] else terms).append(ent)
            if not terms and not sparse_terms:
                continue
            out = _prune_query_entries(
                qid, terms, sparse_terms, k, empty, cross_term
            )
            if len(out):
                outs.append(out)
        return pd.concat(outs, ignore_index=True) if outs else empty

    return fn


N_COARSE_RANGES = 32  # coarse ranges per qshard group for the cross-term θ
# A/B toggle (bench + tests): disable to measure what the per-term/sparse
# bounds alone prune — the r3 pruner's behavior
CROSS_TERM_THETA = True


def _cross_term_theta(rterms: list[dict], k: int) -> float:
    """CROSS-TERM θ lower bound from block metadata (the reference-spirit
    extension of the per-term bound: src/block.rs:214-255's block-max pivot
    math across ALL query terms at once).

    The per-term θ only ever proves "k docs score ≥ lb from ONE term" — on
    queries whose score mass is spread across terms it under-bounds by the
    other terms' guaranteed contributions. Pure block metadata cannot sum
    lbs per doc (a doc in term A's block need not appear in term B's), but
    COUNTING can: over a coarse doc range R of integer width W,

      c_t(R) = Σ n_b over blocks of t FULLY contained in R   (exact count)
      l_t(R) = min lb_b over those blocks                    (per-doc floor)

    and for the terms sorted by l desc, at least
      inter_p = max(0, Σ_{i≤p} c_i − (p−1)·W)
    distinct docs lie in ALL of the first p terms' postings within R
    (inclusion–exclusion over ≤ W integer doc ids), each scoring
    ≥ S_p = Σ_{i≤p} l_i. The nested family inter_1 ⊇ inter_2 ⊇ … yields
    disjoint count levels (inter_p − inter_{p+1} docs at value S_p); ranges
    are disjoint, so accumulating levels value-descending until ≥ k docs
    bounds the kth-best FULL score from below. Sparse terms participate with
    exact unit pseudo-blocks (their c is an exact count, l the exact score).

    Coarse (not block-boundary) ranges on purpose: fully-contained blocks
    contribute exact counts with zero span slack, where block-aligned ranges
    would pay (span − width) slack per term and the bound would collapse on
    misaligned block grids. Never lossy: returns −1 when fewer than k docs
    are guaranteed; the caller maxes this with the other θ sources."""
    if not rterms:
        return -1.0
    lo = min((int(t["first"][0]) for t in rterms if t["first"].size), default=0)
    hi = max((int(t["last"][-1]) for t in rterms if t["last"].size), default=-1)
    if hi <= lo:
        return -1.0
    # range granularity adapts to the densest term's block count: a range
    # needs to span ≥ ~2 blocks for full containment to count anything (a
    # term whose blocks are wider than the ranges contributes C = 0 — safe
    # but useless)
    n_ranges = max(1, min(N_COARSE_RANGES, max(t["first"].size for t in rterms) // 2))
    bounds = np.unique(np.linspace(lo, hi + 1, n_ranges + 1).astype(np.int64))
    starts, ends = bounds[:-1], bounds[1:]
    widths = (ends - starts).astype(np.float64)
    nR = starts.size
    T = len(rterms)
    L = np.zeros((T, nR))
    C = np.zeros((T, nR))
    for ti, t in enumerate(rterms):
        # blocks fully inside [s, e): contiguous run (blocks sorted, disjoint)
        i0 = np.searchsorted(t["first"], starts, side="left")
        i1 = np.searchsorted(t["last"], ends - 1, side="right")
        csum = np.concatenate(([0], np.cumsum(t["nb"])))
        for ri in range(nR):
            a, b = int(i0[ri]), int(i1[ri])
            if b > a:
                C[ti, ri] = csum[b] - csum[a]
                L[ti, ri] = float(t["lb"][a:b].min())
    order = np.argsort(-L, axis=0)
    Ls = np.take_along_axis(L, order, axis=0)
    Cs = np.take_along_axis(C, order, axis=0)
    S = np.cumsum(Ls, axis=0)
    CS = np.cumsum(Cs, axis=0)
    p_minus_1 = np.arange(T, dtype=np.float64)[:, None]
    inter = np.maximum(0.0, CS - p_minus_1 * widths[None, :])
    disj = inter - np.vstack([inter[1:], np.zeros((1, nR))])
    vals = S.ravel()
    cnts = disj.ravel()
    m = (cnts > 0) & (vals > 0)
    if not m.any():
        return -1.0
    vals, cnts = vals[m], cnts[m]
    o = np.argsort(-vals, kind="stable")
    cum = np.cumsum(cnts[o])
    idx = int(np.searchsorted(cum, k))
    if idx >= vals.size:
        return -1.0
    return float(vals[o][idx])


def _prune_query_entries(
    qid: int,
    terms: list[dict],
    sparse_terms: list[dict],
    k: int,
    empty: pd.DataFrame,
    cross_term: bool = True,
) -> pd.DataFrame:
    """Prune one query given its per-term entries (dense entries carry
    block-granular first/last/ub/lb/nb + the per-term θ candidate; sparse
    entries are exact decoded pseudo-blocks). Shared by the per-query kernel
    (_prune_one_query) and the distinct-block kernel
    (_make_meta_prune_shared) — the θ/range/emit math lives exactly once."""
    theta = max([-1.0] + [float(t["theta_cand"]) for t in terms])
    if sparse_terms:
        sd = np.concatenate([t["first"] for t in sparse_terms])
        if sd.size:
            uniq, inv = np.unique(sd, return_inverse=True)
            agg = np.zeros(uniq.size)
            np.add.at(agg, inv, np.concatenate([t["ub"] for t in sparse_terms]))
            if uniq.size >= k:
                theta = max(
                    theta, float(np.partition(agg, uniq.size - k)[uniq.size - k])
                )
    # third independent bound: cross-term counting over coarse ranges —
    # fires on queries whose score mass is SPREAD across terms (the per-term
    # and sparse-seed bounds both under-count those); max of valid lower
    # bounds is a valid lower bound
    if cross_term and len(terms) + len(sparse_terms) > 1:
        theta = max(theta, _cross_term_theta(terms + sparse_terms, k))

    def emit(mask_per_term):
        frames = []
        all_terms = terms + sparse_terms
        all_masks = list(mask_per_term) + [
            np.ones(t["shard"].size, dtype=bool) for t in sparse_terms
        ]
        for t, m in zip(all_terms, all_masks):
            if m.any():
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "term": t["term"],
                            "shard": t["shard"][m],
                            "block_id": t["bid"][m],
                        }
                    )
                )
        return pd.concat(frames, ignore_index=True) if frames else empty

    if theta < 0 or not terms:
        return emit([np.ones(t["shard"].size, dtype=bool) for t in terms])

    # both dense blocks and sparse pseudo-blocks contribute range mass;
    # only dense blocks need the overlap mask (sparse always ship)
    sur_starts, sur_ends = _range_survivors(terms + sparse_terms, theta)
    return emit([_overlap_mask(t, sur_starts, sur_ends) for t in terms])


def _dense_theta_cand(lb: np.ndarray, ns: np.ndarray, k: int) -> float:
    """Per-term θ candidate: accumulate blocks in descending-lb order until
    they hold ≥ k docs; the last accepted lb bounds the kth-best score."""
    order = np.argsort(-lb, kind="stable")
    c = np.cumsum(ns[order])
    if c.size and c[-1] >= k:
        j = int(np.searchsorted(c, k))
        return float(lb[order][j])
    return -1.0


def _prune_one_query(
    pdf: pd.DataFrame, avgdl: float, k: int, codec: str, decoded_cache: dict,
    empty: pd.DataFrame, cross_term: bool = True,
) -> pd.DataFrame:
    """Prune one query's blocks within one qshard group (see _make_meta_prune
    for the math). pdf is pre-sorted by (term, first_doc)."""
    qid = int(pdf["query_id"].iloc[0])
    t_np = pdf["term"].to_numpy()
    idf_np = pdf["idf"].to_numpy().astype(np.float64)
    first_np = pdf["first_doc"].to_numpy()
    last_np = pdf["last_doc"].to_numpy()
    ns_np = pdf["n"].to_numpy()
    shard_np = pdf["shard"].to_numpy()
    bid_np = pdf["block_id"].to_numpy()
    pay_np = (
        pdf["payload"].to_numpy() if "payload" in pdf.columns
        else np.full(t_np.size, None, dtype=object)
    )
    ub_all = idf_np * _tfpart(
        pdf["max_tf"].to_numpy().astype(np.float64),
        pdf["min_dl"].to_numpy().astype(np.float64),
        avgdl,
    )
    lb_all = idf_np * _tfpart(
        pdf["min_tf"].to_numpy().astype(np.float64),
        pdf["max_dl"].to_numpy().astype(np.float64),
        avgdl,
    )
    starts = np.concatenate(
        ([0], np.flatnonzero(t_np[1:] != t_np[:-1]) + 1, [t_np.size])
    )
    terms = []          # dense: block-granular entries for range math
    sparse_terms = []   # sparse: exact per-doc pseudo-blocks
    for si in range(starts.size - 1):
        s, e = int(starts[si]), int(starts[si + 1])
        entry = {
            "term": t_np[s],
            "shard": shard_np[s:e],
            "bid": bid_np[s:e],
        }
        if pay_np[s] is not None:
            # sparse term: decode now — exact positions + contributions.
            # Cached across the group's queries: a batch's queries share
            # terms, and each (term, blocks) decodes once per qshard group
            ck = (t_np[s], int(shard_np[s]), int(bid_np[s]), e - s)
            hit = decoded_cache.get(ck)
            if hit is None:
                hit = decode_block_rows(
                    decompress_payloads(list(pay_np[s:e]), codec), ns_np[s:e]
                )
                decoded_cache[ck] = hit
            d, tf, dl = hit
            c = float(idf_np[s]) * _tfpart(
                tf.astype(np.float64), dl.astype(np.float64), avgdl
            )
            entry["first"] = d
            entry["last"] = d
            entry["ub"] = c
            entry["lb"] = c  # exact — the pseudo-block's bound is its score
            entry["nb"] = np.ones(d.size, dtype=np.int64)
            sparse_terms.append(entry)
            continue
        entry["first"] = first_np[s:e]
        entry["last"] = last_np[s:e]
        entry["ub"] = ub_all[s:e]
        entry["lb"] = lb_all[s:e]
        entry["nb"] = ns_np[s:e]
        entry["theta_cand"] = _dense_theta_cand(lb_all[s:e], ns_np[s:e], k)
        terms.append(entry)
    return _prune_query_entries(qid, terms, sparse_terms, k, empty, cross_term)



def _resolve_live(
    spark: SparkSession, handles: list, paths: list, live_dir: str | None
) -> tuple[DataFrame, float, float] | None:
    """(doc_id → live_gen map, live n_docs, live avgdl) for a generation
    list — from the persisted live map when live_dir is given (retry-once +
    inline-derivation fallback on the documented unreadable windows), else
    derived inline from the membership tables. None ⇒ the live corpus is
    empty (serve an empty result)."""
    live = None
    n_docs = avgdl = 0.0
    if live_dir is not None:
        from grenad_spark.index.live import read_live_map

        try:
            from pyspark.errors import AnalysisException
        except ImportError:  # pragma: no cover - very old pyspark
            from pyspark.sql.utils import AnalysisException

        for attempt in range(2):
            try:
                live, n_docs, avgdl = read_live_map(spark, live_dir, paths)
                break
            except (ValueError, FileNotFoundError, OSError, AnalysisException) as exc:
                # unreadable-map window: the live map is REWRITTEN in place
                # (directory overwrite — seconds, not an atomic rename), so a
                # concurrent reader can see a missing dir (AnalysisException
                # from the parquet reader), a missing/partial live_docs
                # (_SUCCESS guard in read_live_map), or a stale generation
                # set (ValueError). Retry once, then fall back to the inline
                # derivation below, which is always correct for THIS caller's
                # generation list (just pays the membership aggregate).
                if attempt == 0:
                    import time as _time

                    _time.sleep(0.05)
                    continue
                import warnings

                warnings.warn(
                    f"live map at {live_dir} unreadable ({exc}); serving this "
                    f"batch via inline membership derivation",
                    RuntimeWarning,
                    stacklevel=2,
                )
        if live is not None and n_docs == 0:
            return None
    if live is None:
        docs_union = None
        for i, h in enumerate(handles):
            d = h.docs(spark).withColumn("gen", F.lit(i))
            docs_union = d if docs_union is None else docs_union.unionByName(d)
        live = docs_union.groupBy("doc_id").agg(F.max("gen").alias("live_gen"))
        live_docs = (
            docs_union.join(live, "doc_id")
            .filter(F.col("gen") == F.col("live_gen"))
            .select("doc_id", "dl")
        )
        st = live_docs.agg(
            F.count("*").cast("double").alias("n"), F.avg("dl").alias("a")
        ).first()
        # all generations empty / every doc tombstoned: avg(dl) is NULL —
        # return empty like the other search paths
        # (test_out_of_vocabulary_edges contract)
        if not st["n"] or st["a"] is None:
            return None
        n_docs, avgdl = float(st["n"]), float(st["a"])
    return live, n_docs, avgdl


def search_topk_fresh(
    spark: SparkSession,
    index_paths_or_handles: list,
    queries: list[tuple[int, str]],
    k: int = 10,
    live_dir: str | None = None,
) -> DataFrame:
    """QUERY-TIME GENERATION MERGE — grenad's MergerIter at read time.

    Searches the LOGICAL corpus across unmerged generation indexes (a base
    build plus crawl deltas): the newest generation containing a doc wins,
    exactly as compaction would decide, but WITHOUT waiting for compaction —
    the LSM read path that keeps results fresh while the crawler runs.

    Dataflow (pruned to query terms throughout): per-generation pruned block
    scan → vectorized decode (per-generation codec) → doc-level tombstone
    filter (doc → newest generation) → BM25 over the merged postings with
    LIVE corpus stats (n_docs/avgdl over live docs, df per query term over
    live postings). At web scale the decode touches only query-term blocks
    of ≤25 generations; the live map is doc-keyed and co-partitionable (AQE
    broadcasts it when the delta is small).

    live_dir — the PERSISTED live map written at delta-build time
    (index/live.py). With it, the serving plan never touches the membership
    tables: no corpus-sized groupBy and no stats action per query batch.
    Without it (None), both are derived inline — correct, but a
    corpus-membership-sized aggregate per call.

    A live map that is momentarily unreadable (mid-swap rename window,
    compaction in flight, stale generation set after a delta build before
    its _refresh completes) is retried once and then served via the inline
    derivation with a warning — a concurrent reader never fails outright on
    a map that is merely behind (index/live.py documents the windows)."""
    from grenad_spark.index.build import IndexHandle
    from grenad_spark.index.compact import _DECODED_SCHEMA, _make_decode_partition
    from grenad_spark.query.bm25 import score_expr

    handles = [
        h if isinstance(h, IndexHandle) else IndexHandle(h)
        for h in index_paths_or_handles
    ]
    paths = [
        h if not isinstance(h, IndexHandle) else h.path
        for h in index_paths_or_handles
    ]
    pairs = _tokenize_queries(queries)
    terms = sorted({t for _, t in pairs})
    codecs = [h.payload_codec for h in handles]

    seg_union = None
    for i, h in enumerate(handles):
        s = (
            h.segments(spark)
            .filter(F.col("term").isin(terms))
            .select("term", "shard", "block_id", "n", "payload")
            .withColumn("gen", F.lit(i))
        )
        seg_union = s if seg_union is None else seg_union.unionByName(s)

    resolved = _resolve_live(spark, handles, paths, live_dir)
    if resolved is None:
        return spark.createDataFrame([], _OUT_SCHEMA)
    live, n_docs, avgdl = resolved

    decoded = seg_union.mapInPandas(_make_decode_partition(codecs), _DECODED_SCHEMA)
    tdt = (
        decoded.join(live, "doc_id")
        .filter(F.col("gen") == F.col("live_gen"))
        .select("term", "doc_id", "tf", "dl")
    )
    # df per query term over the LIVE corpus — BM25 only ever needs df for
    # the query terms, so the stats job is pruned-scan sized
    ts = tdt.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    qt = spark.createDataFrame(pairs, "query_id int, term string")
    per_term = (
        tdt.join(F.broadcast(qt), "term")
        .join(F.broadcast(ts), "term")
        .select(
            "query_id",
            "doc_id",
            score_expr(
                F.col("tf").cast("double"), F.col("df"),
                F.col("dl").cast("double"), n_docs, avgdl,
            ).alias("s"),
        )
    )
    scored = per_term.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("s"), SCORE_DECIMALS).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .select("query_id", "doc_id", "score")
    )


def search_topk_shared(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
    k: int = 10,
    prune: bool = False,
) -> DataFrame:
    """DECODE-ONCE, SCORE-MANY batch serving.

    The per-query paths join query_ids onto block rows, so a batch of Q
    queries sharing common terms shuffles each payload up to Q times — at a
    64-query batch that duplication dominates wall clock. This path ships
    every distinct (term, qshard) block exactly ONCE (shuffle ∝ index slice,
    not Q × slice), decodes each term once per group, and scores all queries
    against the decoded arrays inside one UDF pass — the standard batch shape
    of production search tiers. Results are identical to mode='exhaustive'
    (asserted in tests/test_search.py).

    prune=True composes the pass-1 metadata pruner on top: shuffle becomes
    ∝ the UNION over queries of surviving blocks (each block still ships at
    most once). Exact by the same argument as wand_pruned: a block pruned
    for query q only held docs whose full q-score is below q's θ − ε, so the
    partial scores those docs may get from blocks other queries kept can
    never enter q's top-k even on a rounded tie. Requires v2 block metadata;
    silently serves unpruned otherwise.

    Requires the driver-held df map (vocab-gated); falls back to the
    per-query batched WAND path on huge vocabularies."""
    pairs = _tokenize_queries(queries)
    dfm = index.df_map(spark)
    if dfm is None:  # 10^9-term vocab: no driver idf map — per-query path
        return _search_from_pairs(spark, index, pairs, k, "wand")
    n_docs = float(index.n_docs)
    avgdl = float(index.avgdl)
    codec = index.payload_codec
    kk = int(k)
    # (query_id, term, idf) resolved driver-side; terms absent from the
    # vocabulary score nothing and drop here
    qinfo = [
        (q, t, _driver_idf(n_docs, dfm[t]))
        for q, t in pairs
        if t in dfm
    ]
    terms = sorted({t for _, t, _ in qinfo})
    if not terms:
        return spark.createDataFrame([], _OUT_SCHEMA)

    g, n_qshards = _qshard_params(spark, index, _est_postings(spark, index, pairs))

    seg = index.segments(spark).filter(F.col("term").isin(terms))
    if prune and "min_tf" in seg.columns:
        # pass 1 runs exactly ONCE (the collect); the attach is rebuilt
        # from the collected rows either way. A SUPERSET of the survivors
        # is exact here (every shipped block is scored exhaustively for all
        # queries sharing its term), so the literal key can drop both
        # query_id and term — (shard, block_id) collisions just ship the
        # harmless extra block once.
        surv_df = survivor_blocks(spark, index, pairs, kk)
        bs = int(index.manifest.get("block_size") or 128)
        est_blocks = sum(-(-dfm[t] // bs) for t in terms if t in dfm)
        attached = False
        if int(index.n_shards) < (1 << 20) and est_blocks <= 2048:
            srows = surv_df.select("shard", "block_id").collect()
            if not srows:
                return spark.createDataFrame([], _OUT_SCHEMA)
            if all(0 <= r["block_id"] < (1 << 20) for r in srows):
                keys = sorted(
                    {(int(r["shard"]) << 20) | int(r["block_id"]) for r in srows}
                )
                seg = seg.filter(
                    F.expr(
                        "shiftleft(CAST(shard AS BIGINT), 20) + block_id IN "
                        f"({','.join(map(str, keys))})"
                    )
                )
                attached = True
        if not attached:
            surv = F.broadcast(
                surv_df.select("term", "shard", "block_id").distinct()
            )
            seg = seg.join(surv, ["term", "shard", "block_id"])
    blocks = seg.select(
        (F.col("shard") / g).cast("int").alias("qshard"),
        "term", "n", "payload",
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        # decode each term ONCE: (docs, tfpart) — idf applied per query-term
        decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for term, gdf in pdf.groupby("term", sort=False):
            d, tf, dl = decode_block_rows(
                decompress_payloads(list(gdf["payload"]), codec), gdf["n"].to_numpy()
            )
            decoded[term] = (d, _tfpart(tf.astype(np.float64), dl.astype(np.float64), avgdl))
        if not decoded:
            return _empty_out()
        sizes = [d.size for d, _ in decoded.values() if d.size]
        if not sizes:
            return _empty_out()
        # block rows arrive in shuffle order (NOT doc order) — min/max, not
        # first/last elements
        lo = min(int(d.min()) for d, _ in decoded.values() if d.size)
        hi = max(int(d.max()) for d, _ in decoded.values() if d.size)
        width = hi - lo + 1
        use_dense = width <= max(65536, 8 * sum(sizes))
        outs = []
        by_query: dict[int, list[tuple[str, float]]] = {}
        for q, t, idf in qinfo:
            if t in decoded:
                by_query.setdefault(q, []).append((t, idf))
        dense = np.zeros(width) if use_dense else None
        for q, tlist in by_query.items():
            if use_dense:
                dense[:] = 0.0
                for t, idf in tlist:
                    d, tfp = decoded[t]
                    np.add.at(dense, d - lo, idf * tfp)
                cand = np.flatnonzero(dense > 0.0)
                if cand.size:
                    outs.append(_topk_rows(q, cand.astype(np.int64) + lo, dense[cand], kk))
            else:  # sparse group over a huge doc range: sort-merge path
                ds = np.concatenate([decoded[t][0] for t, _ in tlist])
                ss = np.concatenate([i * decoded[t][1] for t, i in tlist])
                uniq, inv = np.unique(ds, return_inverse=True)
                agg = np.zeros(uniq.size)
                np.add.at(agg, inv, ss)
                outs.append(_topk_rows(q, uniq, agg, kk))
        if not outs:
            return _empty_out()
        return pd.concat(outs, ignore_index=True)

    # single work-sized group: narrow coalesce, no exchange — same trick as
    # _search_from_pairs; map-protocol dispatch via _grouped_apply
    per_shard = _grouped_apply(
        blocks, ["qshard"], fn, _OUT_SCHEMA, n_qshards, slice_groups=False
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_shard.withColumn("score", F.round("score", SCORE_DECIMALS))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= kk)
        .select("query_id", "doc_id", "score")
    )


def _empty_out() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "query_id": pd.Series(dtype="int32"),
            "doc_id": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64"),
        }
    )


def _topk_rows(qid: int, doc_ids: np.ndarray, scores: np.ndarray, k: int) -> pd.DataFrame:
    # full (score desc, doc_id asc) ordering — NOT argpartition: partitioning
    # on score alone drops tied candidates arbitrarily, and the doc-id
    # tie-break is part of the ranking contract (Hypothesis-caught: a shard
    # top-k that keeps doc 4 but drops doc 1 at equal score is wrong even
    # though the global window re-sorts survivors)
    # round BEFORE the shard-level truncation: the global window (and the
    # DuckDB oracle) rank on round(score, SCORE_DECIMALS); truncating on raw
    # scores could drop a doc that round-ties the kth score with a smaller
    # doc_id — shard-level and global ordering must use the same key
    scores = np.round(scores, SCORE_DECIMALS)
    order = np.lexsort((doc_ids, -scores))[:k]
    return pd.DataFrame(
        {"query_id": qid, "doc_id": doc_ids[order], "score": scores[order]}
    )


def _make_exhaustive(avgdl: float, k: int, codec: str = "none"):
    """Fully vectorized scatter-add scoring of one (query, shard) group."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        # one vectorized decode across ALL terms' blocks, then per-term
        # segment-aware scoring via np.add.at on dense doc offsets
        doc_parts, score_parts = [], []
        for (_, idf), g in pdf.groupby(["term", "idf"], sort=False):
            d, tf, dl = decode_block_rows(decompress_payloads(list(g["payload"]), codec), g["n"].to_numpy())
            s = float(idf) * _tfpart(tf.astype(np.float64), dl.astype(np.float64), avgdl)
            doc_parts.append(d)
            score_parts.append(s)
        if not doc_parts:
            return _empty_out()
        docs = np.concatenate(doc_parts)
        scores = np.concatenate(score_parts)
        # dense scatter when the group's doc range is bounded (same guard and
        # same input-order accumulation as the WAND kernel — bit-identical
        # sums); a sparse group over a huge doc range falls back to the
        # O(n log n) unique merge
        lo = int(docs.min())
        width = int(docs.max()) - lo + 1
        if width <= max(65536, 8 * docs.size):
            dense = np.zeros(width)
            np.add.at(dense, docs - lo, scores)
            cand = np.flatnonzero(dense > 0.0)
            return _topk_rows(qid, cand.astype(np.int64) + lo, dense[cand], k)
        uniq, inv = np.unique(docs, return_inverse=True)
        agg = np.zeros(uniq.size)
        np.add.at(agg, inv, scores)
        return _topk_rows(qid, uniq, agg, k)

    return fn


# in-UDF sparse threshold: a term whose postings WITHIN the group total at
# most this many decodes upfront and prunes at exact posting positions (unit
# pseudo-blocks). Without it, a rare term's block span covers most of the
# group's doc range and its UB resurrects every range it touches — block-
# granular pruning then structurally can't fire on exactly the zipfian
# queries it exists for (measured: ~100% of ranges survived).
SPARSE_GROUP_POSTINGS = 4096


def _make_wand_batched(
    avgdl: float, k: int, codec: str = "none",
    sparse_postings_max: int = SPARSE_GROUP_POSTINGS,
):
    """Batched block-max pruning — the vectorized serving path.

    The cursor WAND (_make_wand) is algorithmically faithful to grenad's
    pull-based seek loop but pays per-pivot Python overhead. This variant
    keeps the same block-max math with NO per-doc Python:

      0. SPARSE terms (≤ sparse_postings_max postings in the group) decode
         upfront — cheap by the bound — and turn into exact unit-width
         pseudo-blocks (first=last=doc, ub=exact contribution), so ranges
         BETWEEN their postings carry zero mass from them.
      1. θ₀: decode the single best block of the highest-impact term, compute
         those docs' EXACT scores (decoding just the blocks of other terms
         that contain them), take the kth best.
      2. Split the shard's doc space at every block boundary; for each
         resulting range, UB(range) = Σ_terms block_ub of the overlapping
         block. Ranges with UB ≤ θ₀ cannot contain a top-k doc — skip.
      3. Decode only blocks overlapping surviving ranges, mask decoded docs
         to surviving ranges (exactness at θ ties), scatter-add, top-k.

    On adversarially uniform corpora nothing prunes and this degrades to the
    exhaustive scorer plus metadata work; on zipfian corpora the rare terms'
    exact positions kill every head-term-only range, exactly like block-max
    WAND over essential lists.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return _empty_out()
        qid = int(pdf["query_id"].iloc[0])
        # ONE sort + numpy boundary slicing instead of pandas groupby +
        # per-group sort_values: per-group metadata prep was the dominant
        # cost for small groups (measured ~3 ms of a ~5 ms group)
        pdf = pdf.sort_values(["term", "first_doc"], kind="stable")
        t_np = pdf["term"].to_numpy()
        idf_np = pdf["idf"].to_numpy().astype(np.float64)
        first_np = pdf["first_doc"].to_numpy()
        last_np = pdf["last_doc"].to_numpy()
        ns_np = pdf["n"].to_numpy()
        pay_np = pdf["payload"].to_numpy()
        ub_all = idf_np * _tfpart(
            pdf["max_tf"].to_numpy().astype(np.float64),
            pdf["min_dl"].to_numpy().astype(np.float64),
            avgdl,
        )
        starts = np.concatenate(
            ([0], np.flatnonzero(t_np[1:] != t_np[:-1]) + 1, [t_np.size])
        )
        terms = []
        for si in range(starts.size - 1):
            s, e = int(starts[si]), int(starts[si + 1])
            terms.append(
                {
                    "idf": float(idf_np[s]),
                    "first": first_np[s:e],
                    "last": last_np[s:e],
                    "ns": ns_np[s:e],
                    "payloads": pay_np[s:e],
                    "ub": ub_all[s:e],
                }
            )
        if not terms:
            return _empty_out()

        def decode_term_blocks(t, bidx):
            """Decode selected blocks of one term -> (docs, scores). A
            sparse term's pseudo-blocks are one posting each — slicing the
            cached decode IS the block selection."""
            if bidx.size == 0:
                return np.empty(0, dtype=np.int64), np.empty(0)
            if "decoded" in t:
                d, s = t["decoded"]
                return d[bidx], s[bidx]
            d, tf, dl = decode_block_rows(
                decompress_payloads([t["payloads"][i] for i in bidx], codec), t["ns"][bidx]
            )
            s = t["idf"] * _tfpart(tf.astype(np.float64), dl.astype(np.float64), avgdl)
            return d, s

        # --- phase 0: sparse terms -> exact unit pseudo-blocks
        if len(terms) > 1:
            for t in terms:
                tot = int(t["ns"].sum())
                if 0 < tot <= int(sparse_postings_max):
                    d, s = decode_term_blocks(t, np.arange(len(t["payloads"])))
                    t["first"] = d
                    t["last"] = d
                    t["ns"] = np.ones(d.size, dtype=np.int64)
                    t["ub"] = s
                    t["decoded"] = (d, s)
                    t["payloads"] = [None] * d.size  # len() used for bounds

        # --- phase 1: θ₀ from the best blocks of the highest-impact terms.
        # Take blocks in descending-UB order until the seed holds ≥ k DISTINCT
        # docs, CONTINUING into the next-best term when one term's postings
        # run out: a rare term (the highest-impact one on zipfian corpora)
        # often has fewer than k docs in a group, which would otherwise leave
        # θ = -1 and disable pruning exactly where it matters most.
        seed_parts = []
        n_seed = 0
        for t in sorted(terms, key=lambda t: -float(t["ub"].max())):
            ub_order = np.argsort(-t["ub"], kind="stable")
            acc_docs = np.cumsum(t["ns"][ub_order])
            nb = int(np.searchsorted(acc_docs, max(1, k - n_seed))) + 1
            d, _ = decode_term_blocks(t, np.sort(ub_order[:nb]))
            seed_parts.append(d)
            n_seed = np.unique(np.concatenate(seed_parts)).size
            if n_seed >= k:
                break
        seed_docs = np.unique(np.concatenate(seed_parts))
        seed_scores = np.zeros(seed_docs.size)
        for t in terms:
            # blocks of t containing any seed doc
            bi = np.unique(np.searchsorted(t["last"], seed_docs))
            bi = bi[bi < len(t["payloads"])]
            d, s = decode_term_blocks(t, bi)
            if d.size == 0:  # seed docs all past this term's last block
                continue
            pos = np.searchsorted(d, seed_docs)
            hit = (pos < d.size) & (d[np.minimum(pos, d.size - 1)] == seed_docs)
            seed_scores[hit] += s[pos[hit]]
        if seed_docs.size >= k:
            theta = float(np.partition(seed_scores, seed_docs.size - k)[seed_docs.size - k])
        else:
            theta = -1.0

        # --- phase 2: range UBs on block-boundary-aligned doc ranges
        # (shared machinery with the pass-1 metadata pruner — see
        # _range_survivors for the θ-tie/PRUNE_EPS reasoning)
        sur_starts, sur_ends = _range_survivors(terms, theta)

        # --- phase 3: decode surviving blocks, mask, score, top-k.
        # Scoring uses a DENSE scatter over the group's doc range (known
        # exactly from the block first/last metadata — a block-max payoff):
        # dense[d - lo] += s is a branchless O(postings) accumulate with no
        # sort, vs the O(n log n) np.unique merge. Guarded by a width cap so
        # a sparse group over a huge doc range falls back to the merge path.
        doc_parts, score_parts = [], []
        for t in terms:
            # a block survives if any surviving range overlaps it
            bidx = np.flatnonzero(_overlap_mask(t, sur_starts, sur_ends))
            d, s = decode_term_blocks(t, bidx)
            if d.size == 0:
                continue
            # mask decoded docs to surviving ranges (exactness at θ ties)
            ridx = np.searchsorted(sur_starts, d, side="right") - 1
            ok = (ridx >= 0) & (d < sur_ends[np.maximum(ridx, 0)])
            if ok.any():
                doc_parts.append(d[ok])
                score_parts.append(s[ok])
        if not doc_parts:
            return _empty_out()
        n_post = sum(p.size for p in doc_parts)
        lo = int(min(int(p[0]) for p in doc_parts))
        hi = int(max(int(p[-1]) for p in doc_parts))
        width = hi - lo + 1
        if width <= max(65536, 8 * n_post):
            dense = np.zeros(width)
            for d, s in zip(doc_parts, score_parts):
                np.add.at(dense, d - lo, s)
            # θ-filter before the ranking sort: every true top-k doc scores
            # ≥ θ (θ is a lower bound on the kth score), so keeping
            # score > θ - PRUNE_EPS (rounded-tie slack) is lossless and cuts
            # the lexsort to the contender set
            # clamp at 0 so absent docs (exact 0.0 in the dense array) can
            # never pass the filter
            filter_thr = max(theta - PRUNE_EPS, 0.0)
            cand = np.flatnonzero(dense > filter_thr)
            if filter_thr > 0.0 and cand.size < k:
                cand = np.flatnonzero(dense > 0.0)
            return _topk_rows(qid, cand.astype(np.int64) + lo, dense[cand], k)
        docs = np.concatenate(doc_parts)
        scores = np.concatenate(score_parts)
        uniq, inv = np.unique(docs, return_inverse=True)
        agg = np.zeros(uniq.size)
        np.add.at(agg, inv, scores)
        return _topk_rows(qid, uniq, agg, k)

    return fn


# wand_cursor guard: the cursor variant pays per-pivot PYTHON cost, so a
# group beyond this many postings silently delegates to the batched kernel
# (identical results — both are exact; asserted in tests). The bound keeps
# the educational mode reachable for small corpora/tests while making the
# O(docs)-Python loop unpickable at scale from the public IndexHandle API.
WAND_CURSOR_MAX_POSTINGS = 100_000


def _make_wand(avgdl: float, k: int, codec: str = "none"):
    """Block-max WAND over one (query, shard) group — the ALGORITHM-FAITHFUL
    educational variant (reference/test use only; not a default serving path).

    Doc-at-a-time pivoting with per-term block cursors; a block is decoded
    only when the pivot lands in it AND the sum of block upper bounds at the
    pivot exceeds the running threshold θ. Block seek = np.searchsorted over
    the block last_doc array (the sparse-footer binary search of
    src/block.rs:214-255). This is grenad's pull-based seek loop verbatim in
    spirit — and therefore per-pivot Python: groups beyond
    WAND_CURSOR_MAX_POSTINGS delegate to _make_wand_batched, the vectorized
    kernel with the same block-max math (and identical output — both exact).
    """
    batched = _make_wand_batched(avgdl, k, codec)
    # snapshot at plan time (same worker-import caveat as _make_meta_prune)
    max_postings = WAND_CURSOR_MAX_POSTINGS

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if int(pdf["n"].sum()) > max_postings:
            return batched(pdf)
        qid = int(pdf["query_id"].iloc[0])
        # per-term cursor state
        terms = []
        for (_, idf), g in pdf.groupby(["term", "idf"], sort=False):
            g = g.sort_values("first_doc", kind="stable")
            idf = float(idf)
            ub_blocks = idf * _tfpart(
                g["max_tf"].to_numpy().astype(np.float64),
                g["min_dl"].to_numpy().astype(np.float64),
                avgdl,
            )
            terms.append(
                {
                    "idf": idf,
                    "first": g["first_doc"].to_numpy(),
                    "last": g["last_doc"].to_numpy(),
                    "payloads": list(g["payload"]),
                    "ub_blocks": ub_blocks,
                    "ub_term": float(ub_blocks.max()),
                    "bi": 0,          # current block index
                    "docs": None,      # decoded current block
                    "scores": None,
                    "pi": 0,           # position within decoded block
                    "cur": None,       # current doc id (None = before first)
                    "exhausted": False,
                }
            )
        if not terms:
            return _empty_out()

        def load_block(t, bi):
            d, tf, dl = decode_block(decompress_payload(t["payloads"][bi], codec))
            t["bi"] = bi
            t["docs"] = d
            t["scores"] = t["idf"] * _tfpart(tf.astype(np.float64), dl.astype(np.float64), avgdl)
            t["pi"] = 0
            t["cur"] = int(d[0])

        def next_geq(t, target):
            """Advance cursor to first doc >= target (grenad
            move_on_key_greater_than_or_equal_to, reader_cursor.rs:184-209)."""
            if t["exhausted"]:
                return
            bi = int(np.searchsorted(t["last"], target))
            if bi >= len(t["payloads"]):
                t["exhausted"] = True
                t["cur"] = None
                return
            if t["docs"] is None or bi != t["bi"]:
                load_block(t, bi)
            pi = int(np.searchsorted(t["docs"], target))
            if pi >= t["docs"].size:  # target in gap after this block
                if bi + 1 >= len(t["payloads"]):
                    t["exhausted"] = True
                    t["cur"] = None
                    return
                load_block(t, bi + 1)
                pi = 0
            t["pi"] = pi
            t["cur"] = int(t["docs"][pi])

        for t in terms:
            next_geq(t, 0)

        heap: list[tuple[float, int]] = []  # (score, doc_id) min-heap of top-k
        import heapq

        theta = -1.0
        while True:
            live = [t for t in terms if not t["exhausted"]]
            if not live:
                break
            live.sort(key=lambda t: t["cur"])
            # find pivot: smallest doc such that Σ ub_term of terms with
            # cur <= doc can beat θ
            acc = 0.0
            pivot_idx = None
            for i, t in enumerate(live):
                acc += t["ub_term"]
                # θ is a rounded score; a raw UB within PRUNE_EPS can still
                # round-tie the kth slot and win by doc_id
                if acc > theta - PRUNE_EPS:
                    pivot_idx = i
                    break
            if pivot_idx is None:
                break  # no doc can beat θ
            pivot = live[pivot_idx]["cur"]
            if live[0]["cur"] == pivot:
                # block-max refinement: exact block UBs at the pivot, over
                # EVERY term whose cursor sits at the pivot (terms beyond
                # pivot_idx may also be at the pivot and contribute score —
                # omitting them under-bounds and wrongly skips docs)
                at_pivot = [t for t in live if t["cur"] == pivot]
                block_ub = 0.0
                for t in at_pivot:
                    bi = int(np.searchsorted(t["last"], pivot))
                    if bi < len(t["payloads"]) and t["first"][bi] <= pivot:
                        block_ub += float(t["ub_blocks"][bi])
                    else:
                        block_ub += t["ub_term"]  # conservative
                if block_ub > theta - PRUNE_EPS:
                    score = 0.0
                    for t in live:
                        if t["cur"] == pivot:
                            if t["docs"] is None:
                                load_block(t, t["bi"])
                            # ensure cursor decoded at pivot position
                            pi = t["pi"]
                            score += float(t["scores"][pi])
                    # heap decisions on ROUNDED scores so the retained set
                    # matches the oracle's (round → rank → doc_id tie-break)
                    score = round(score, SCORE_DECIMALS)
                    if len(heap) < k:
                        heapq.heappush(heap, (score, -pivot))
                        if len(heap) == k:
                            theta = heap[0][0]
                    elif score > heap[0][0] or (
                        score == heap[0][0] and -pivot > heap[0][1]
                    ):
                        heapq.heapreplace(heap, (score, -pivot))
                        theta = heap[0][0]
                for t in live:
                    if t["cur"] == pivot:
                        next_geq(t, pivot + 1)
            else:
                # advance all pre-pivot cursors to the pivot
                for t in live[:pivot_idx]:
                    if t["cur"] < pivot:
                        next_geq(t, pivot)
        if not heap:
            return _empty_out()
        docs = np.array([-d for _, d in heap], dtype=np.int64)
        scores = np.array([s for s, _ in heap])
        return _topk_rows(qid, docs, scores, k)

    return fn


# ---------------------------------------------------------------------------
# typo-ranked fuzzy search — the Meilisearch rule pipeline words → typo →
# relevance applied to typo-tolerant queries: docs covering more query-term
# slots rank first, then fewer total typos (Σ per covered slot of the min
# edit distance among the doc's matched derivations), then BM25, then doc.
# ---------------------------------------------------------------------------

_OUT_TYPO_SCHEMA = "query_id int, doc_id long, hit_terms int, typos long, score double"


def _levenshtein(a: str, b: str) -> int:
    """Plain DP edit distance (driver-side only, expansion-set sized)."""
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _make_typo_ranked_kernel(
    slot_meta: dict[int, dict[str, list[tuple[int, int]]]],
    avgdl: float,
    codec: str,
):
    """slot_meta: qid -> {expansion term -> [(qterm slot, edit distance)]}.
    One expansion term may serve SEVERAL query slots (each within
    max_edits) — the oracle credits every slot, so the kernel must too."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        meta = slot_meta[qid]
        doc_parts, score_parts = [], []
        cov_docs, cov_slots, cov_typos = [], [], []
        for (term, idf), g in pdf.groupby(["term", "idf"], sort=False):
            d, tf, dl = decode_block_rows(
                decompress_payloads(list(g["payload"]), codec), g["n"].to_numpy()
            )
            s = float(idf) * _tfpart(tf.astype(np.float64), dl.astype(np.float64), avgdl)
            doc_parts.append(d)
            score_parts.append(s)
            for slot, typo in meta[term]:
                cov_docs.append(d)
                cov_slots.append(np.full(d.size, slot, dtype=np.int64))
                cov_typos.append(np.full(d.size, typo, dtype=np.int64))
        if not doc_parts:
            return pd.DataFrame(
                {
                    "query_id": pd.Series(dtype="int32"),
                    "doc_id": pd.Series(dtype="int64"),
                    "hit_terms": pd.Series(dtype="int32"),
                    "typos": pd.Series(dtype="int64"),
                    "score": pd.Series(dtype="float64"),
                }
            )
        n_slots = 1 + max(s for tl in meta.values() for s, _ in tl)
        packed = np.concatenate(cov_docs) * np.int64(n_slots) + np.concatenate(cov_slots)
        tarr = np.concatenate(cov_typos)
        uniq, inv = np.unique(packed, return_inverse=True)
        mintypo = np.full(uniq.size, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mintypo, inv, tarr)
        docs_u = uniq // np.int64(n_slots)
        du, dinv = np.unique(docs_u, return_inverse=True)
        hits = np.zeros(du.size, dtype=np.int64)
        np.add.at(hits, dinv, 1)
        tsum = np.zeros(du.size, dtype=np.int64)
        np.add.at(tsum, dinv, mintypo)
        # BM25 over the distinct expansion terms, aggregated per doc
        docs_all = np.concatenate(doc_parts)
        scores_all = np.concatenate(score_parts)
        su, sinv = np.unique(docs_all, return_inverse=True)
        sagg = np.zeros(su.size)
        np.add.at(sagg, sinv, scores_all)
        # su == du: both are the docs matching >= 1 expansion term
        return pd.DataFrame(
            {
                "query_id": qid,
                "doc_id": du,
                "hit_terms": hits.astype(np.int32),
                "typos": tsum,
                "score": sagg,
            }
        )

    return fn


def search_topk_fuzzy_ranked(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_edits: int = 1,
) -> DataFrame:
    """Typo-tolerant search ranked by the Meilisearch rule pipeline:
    (covered query-term slots DESC, total typos ASC, BM25 DESC, doc_id ASC).
    (query_id, doc_id, hit_terms, typos, score). Expansion reuses the
    persisted typo tables (bigram / SymSpell paths); slot+distance metadata
    is driver-computed over the expansion set and rides the kernel closure
    (block rows never duplicate per slot)."""
    pairs = expand_fuzzy_queries(spark, index, queries, max_edits)
    if not pairs:
        return spark.createDataFrame([], _OUT_TYPO_SCHEMA)
    qslots: dict[int, list[str]] = {}
    for qid, qterm in _tokenize_queries(queries):
        qslots.setdefault(qid, []).append(qterm)
    slot_meta: dict[int, dict[str, list[tuple[int, int]]]] = {}
    for qid, term in pairs:
        tl = []
        for slot, qterm in enumerate(qslots[qid]):
            d = _levenshtein(term, qterm)
            if d <= max_edits:
                tl.append((slot, d))
        if tl:
            slot_meta.setdefault(qid, {})[term] = tl
    pairs = [(q, t) for q, t in pairs if t in slot_meta.get(q, {})]
    if not pairs:
        return spark.createDataFrame([], _OUT_TYPO_SCHEMA)
    blocks, _ = _query_blocks_from_pairs(spark, index, pairs)
    avgdl = float(index.avgdl)
    codec = index.payload_codec
    per_shard = blocks.select(
        "query_id", _qshard_col(spark, index), "term", "idf", "n", "payload"
    ).transform(lambda _d: _grouped_apply(_d, ["query_id", "shard"], 
        _make_typo_ranked_kernel(slot_meta, avgdl, codec), _OUT_TYPO_SCHEMA
    ))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("hit_terms"), F.asc("typos"), F.desc("score"), F.asc("doc_id")
    )
    return (
        per_shard.withColumn("score", F.round("score", SCORE_DECIMALS))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .select("query_id", "doc_id", "hit_terms", "typos", "score")
    )


def search_topk_page(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
    offset: int = 0,
    limit: int = 10,
) -> DataFrame:
    """Paginated search with EXHAUSTIVE total hits (the Meilisearch
    page/hitsPerPage mode, which switches totalHits from an estimate to an
    exact count): (query_id, doc_id, score, rank, total_hits) for ranks
    offset+1 .. offset+limit, rank = (score DESC, doc_id ASC) position,
    total_hits = full disjunctive match-set size.

    Plan: the untruncated per-shard scorer (the AND path's kernel) feeds ONE
    window pass that yields both the rank and the exact count — no second
    scan. The sort carries the full match set, the price Meilisearch also
    pays in this mode (its default estimatedTotalHits mode is the ordinary
    top-k path, search_topk with k = offset + limit)."""
    pairs = _tokenize_queries(queries)
    if not pairs:
        return spark.createDataFrame(
            [], "query_id int, doc_id long, score double, rank int, total_hits long"
        )
    blocks, _ = _query_blocks_from_pairs(spark, index, pairs)
    per_shard = blocks.select(
        "query_id", _qshard_col(spark, index), "term", "idf", "n", "first_doc", "last_doc",
        "max_tf", "min_dl", "payload",
    ).transform(lambda _d: _grouped_apply(_d, ["query_id", "shard"], 
        _make_exhaustive_with_termcount(float(index.avgdl), index.payload_codec),
        _OUT_AND_SCHEMA,
    ))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    cw = Window.partitionBy("query_id")
    return (
        per_shard.withColumn("score", F.round("score", SCORE_DECIMALS))
        .withColumn("rank", F.row_number().over(w))
        .withColumn("total_hits", F.count("*").over(cw).cast("long"))
        .filter((F.col("rank") > int(offset)) & (F.col("rank") <= int(offset) + int(limit)))
        .select("query_id", "doc_id", "score", "rank", "total_hits")
    )


def placeholder_page(
    spark: SparkSession,
    docs: DataFrame,
    filter_sql: str | None,
    sort: list[tuple[str, bool]],
    offset: int = 0,
    limit: int = 20,
) -> DataFrame:
    """Meilisearch PLACEHOLDER search (empty `q`): browse the index under
    filter + sort + exhaustive pagination — no relevance, no index scan.
    sort = [(column, ascending), ...]; doc_id ASC is the final tiebreak.
    Returns (doc_id, rank, total_hits) — rank is 1-based over the full
    sorted match set, total_hits the exact filtered count.

    Scale: the filter is a pushed-down predicate on the documents scan
    (only doc_id + filter/sort columns read). The page is produced by a
    DISTRIBUTED top-(offset+limit) (TakeOrderedAndProject — per-partition
    heaps, no global sort), then one window over those ≤ offset+limit rows;
    total_hits is one column-pruned count agg joined as a literal-sized
    side. A deep page costs O(offset+limit), never a full sort — the same
    reason Meilisearch caps maxTotalHits."""
    base = docs
    if filter_sql:
        base = base.filter(F.expr(filter_sql))
    order = [F.asc(c) if a else F.desc(c) for c, a in sort] + [F.asc("doc_id")]
    cols = ["doc_id"] + [c for c, _ in sort]
    top = base.select(*cols).orderBy(*order).limit(int(offset) + int(limit))
    total = base.select(F.count("*").cast("long").alias("total_hits"))
    w = Window.orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") > int(offset))
        .crossJoin(F.broadcast(total))
        .select("doc_id", "rank", "total_hits")
    )


def sql_placeholder_page(
    filter_sql: str | None,
    sort: list[tuple[str, bool]],
    offset: int = 0,
    limit: int = 20,
) -> str:
    """DuckDB oracle for placeholder_page (same compiled filter string)."""
    order = ", ".join(
        [f"{c} {'ASC' if a else 'DESC'}" for c, a in sort] + ["doc_id ASC"]
    )
    where = f"WHERE {filter_sql}" if filter_sql else ""
    return f"""
WITH f AS (SELECT * FROM documents {where}),
r AS (SELECT doc_id, row_number() OVER (ORDER BY {order}) AS rank FROM f),
t AS (SELECT count(*)::BIGINT AS total_hits FROM f)
SELECT r.doc_id, r.rank::INT AS rank, t.total_hits
FROM r CROSS JOIN t
WHERE r.rank > {int(offset)} AND r.rank <= {int(offset) + int(limit)}
"""


class TypoSettings:
    """Meilisearch typoTolerance settings: a query word shorter than
    `one_typo` chars gets NO typo tolerance, `one_typo`..`two_typos`-1 chars
    one typo, >= `two_typos` chars two; words in `disable_on_words` are
    always exact-only. Meilisearch defaults are 5 / 9 / empty."""

    def __init__(
        self,
        one_typo: int = 5,
        two_typos: int = 9,
        disable_on_words: set[str] | None = None,
    ):
        self.one_typo = int(one_typo)
        self.two_typos = int(two_typos)
        self.disable_on_words = {w.lower() for w in (disable_on_words or set())}

    def budget(self, qterm: str) -> int:
        if qterm in self.disable_on_words or len(qterm) < self.one_typo:
            return 0
        return 1 if len(qterm) < self.two_typos else 2


def typo_slot_expansion(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
    settings: "TypoSettings",
) -> tuple[dict, dict, list]:
    """Shared expansion stage of the typoTolerance serving paths:
    (qslots, slot_meta, pairs) where qslots = qid -> ordered deduped query
    words, slot_meta = qid -> term -> [(slot, distance)], pairs = the
    (qid, term) scan list. Exact words probe the dictionary (In-pruned),
    1-edit rides the bigram table, 2-edit the SymSpell deletion table —
    no bucket scans the vocabulary."""
    qslots: dict[int, list[str]] = {}
    for qid, qterm in _tokenize_queries(queries):
        qslots.setdefault(qid, []).append(qterm)
    if not qslots:
        return {}, {}, []
    by_budget: dict[int, dict[int, list[str]]] = {0: {}, 1: {}, 2: {}}
    for qid, slots in qslots.items():
        for qterm in dict.fromkeys(slots):
            by_budget[settings.budget(qterm)].setdefault(qid, []).append(qterm)
    pairs: list[tuple[int, str]] = []
    if by_budget[0]:
        zero_terms = sorted({t for ts in by_budget[0].values() for t in ts})
        present = {
            r["term"]
            for r in index.term_dict(spark)
            .filter(F.col("term").isin(zero_terms))
            .select("term")
            .collect()
        }
        pairs.extend(
            (qid, t)
            for qid, ts in by_budget[0].items()
            for t in ts
            if t in present
        )
    for budget in (1, 2):
        if by_budget[budget]:
            sub = [(qid, " ".join(ts)) for qid, ts in sorted(by_budget[budget].items())]
            pairs.extend(expand_fuzzy_queries(spark, index, sub, budget))
    pairs = sorted(set(pairs))
    if not pairs:
        return qslots, {}, []
    # slot metadata under PER-SLOT budgets: expansion term t covers slot
    # (qid, i) iff lev(t, word_i) <= budget(word_i)
    slot_meta: dict[int, dict[str, list[tuple[int, int]]]] = {}
    for qid, term in pairs:
        tl = []
        for slot, qterm in enumerate(qslots[qid]):
            d = _levenshtein(term, qterm)
            if d <= settings.budget(qterm):
                tl.append((slot, d))
        if tl:
            slot_meta.setdefault(qid, {})[term] = tl
    pairs = [(q, t) for q, t in pairs if t in slot_meta.get(q, {})]
    return qslots, slot_meta, pairs


def search_topk_typo_settings(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
    settings: TypoSettings | None = None,
    k: int = 10,
) -> DataFrame:
    """Typo-tolerant ranked search under PER-WORD typo budgets (Meilisearch
    typoTolerance.minWordSizeForTypos + disableOnWords): each query word's
    edit budget comes from settings.budget(word); ranking is the same rule
    pipeline as search_topk_fuzzy_ranked (slots DESC, typos ASC, BM25 DESC,
    doc ASC). (query_id, doc_id, hit_terms, typos, score).

    Expansion runs per budget bucket through the persisted tables — exact
    terms as an In(term)-pruned dictionary probe, 1-edit via the bigram
    table, 2-edit via the SymSpell deletion table — so no bucket ever scans
    the vocabulary."""
    settings = settings or TypoSettings()
    qslots, slot_meta, pairs = typo_slot_expansion(spark, index, queries, settings)
    if not pairs:
        return spark.createDataFrame([], _OUT_TYPO_SCHEMA)
    blocks, _ = _query_blocks_from_pairs(spark, index, pairs)
    per_shard = blocks.select(
        "query_id", _qshard_col(spark, index), "term", "idf", "n", "payload"
    ).transform(lambda _d: _grouped_apply(_d, ["query_id", "shard"], 
        _make_typo_ranked_kernel(
            slot_meta, float(index.avgdl), index.payload_codec
        ),
        _OUT_TYPO_SCHEMA,
    ))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("hit_terms"), F.asc("typos"), F.desc("score"), F.asc("doc_id")
    )
    return (
        per_shard.withColumn("score", F.round("score", SCORE_DECIMALS))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .select("query_id", "doc_id", "hit_terms", "typos", "score")
    )


def search_topk_filtered(
    spark: SparkSession,
    index: IndexHandle,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    filter_sql: str,
    k: int = 10,
) -> DataFrame:
    """Meilisearch FILTERABLE-ATTRIBUTES serving: disjunctive BM25 top-k
    restricted to docs satisfying a boolean filter over document attributes
    (`filter: n_chars >= 1200 AND lang IN (...)`). The filter side is a
    pruned documents scan (predicate pushdown, only doc_id + filter columns
    read) semi-joined on doc_id BEFORE ranking — AQE broadcasts whichever
    side a selective filter/rare query makes small. Meilisearch serves hot
    filters from precomputed facet-docids grenad DBs; the facet side tables
    (operators/facets.py) are the equivalent precomputation here.
    (query_id, doc_id, score)."""
    pairs = _tokenize_queries(queries)
    if not pairs:
        return spark.createDataFrame([], "query_id int, doc_id long, score double")
    blocks, _ = _query_blocks_from_pairs(spark, index, pairs)
    per_shard = blocks.select(
        "query_id", _qshard_col(spark, index), "term", "idf", "n", "first_doc", "last_doc",
        "max_tf", "min_dl", "payload",
    ).transform(lambda _d: _grouped_apply(_d, ["query_id", "shard"], 
        _make_exhaustive_with_termcount(float(index.avgdl), index.payload_codec),
        _OUT_AND_SCHEMA,
    ))
    allowed = docs.filter(F.expr(filter_sql)).select("doc_id")
    j = per_shard.join(allowed, "doc_id")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        j.withColumn("score", F.round("score", SCORE_DECIMALS))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .select("query_id", "doc_id", "score")
    )


# ---------------------------------------------------------------------------
# synonyms + stop words — the everyday Meilisearch query-rewrite features
# (configured per index; Meilisearch applies both BEFORE its ranking rules)
# ---------------------------------------------------------------------------

def search_topk_synonyms(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
    synonyms: dict[str, list[str]],
    k: int = 10,
    mode: str = "wand",
) -> DataFrame:
    """Synonym expansion (Meilisearch single-word synonyms): each query term
    rewrites to itself plus its configured synonyms; expansions score as
    ordinary disjuncts through the standard serving kernel. The rewrite is a
    driver-side dict lookup — zero extra jobs, the In(term) pruned scan just
    widens by the synonym set. Synonyms absent from the vocabulary
    contribute nothing (no posting blocks), exactly like OOV query terms."""
    pairs: list[tuple[int, str]] = []
    seen: set[tuple[int, str]] = set()
    for qid, term in _tokenize_queries(queries):
        for t in [term, *synonyms.get(term, [])]:
            if (qid, t) not in seen:
                seen.add((qid, t))
                pairs.append((qid, t))
    if not pairs:
        return spark.createDataFrame([], "query_id int, doc_id long, score double")
    return _search_from_pairs(spark, index, pairs, k, mode)


def sql_synonyms_topk(
    queries: list[tuple[int, str]],
    synonyms: dict[str, list[str]],
    k: int = 10,
) -> str:
    """DuckDB oracle for search_topk_synonyms: the rewrite map as a VALUES
    relation joined to the raw query terms (identity edges included)."""
    from grenad_spark.functions.tokenize import sql_term_doc_tf
    from grenad_spark.query.bm25 import B, K1, SCORE_DECIMALS, sql_queries_values

    qterms = sorted({t for _, t in _tokenize_queries(queries)})
    edges = sorted(
        {(t, t) for t in qterms}
        | {(t, s) for t in qterms for s in synonyms.get(t, [])}
    )
    syn_vals = ", ".join(f"('{a}', '{b}')" for a, b in edges)
    return f"""
WITH tdt AS ({sql_term_doc_tf('documents')}),
dl AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '')) AS dl
  FROM documents
),
cs AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
ts AS (SELECT term, count(*)::DOUBLE AS df FROM tdt GROUP BY term),
rawq AS (
  SELECT DISTINCT query_id, unnest(regexp_split_to_array(lower(query), '{TOKEN_SPLIT_RE}')) AS qterm
  FROM {sql_queries_values(queries)}
),
syn AS (SELECT * FROM (VALUES {syn_vals}) AS s(qterm, term)),
qt AS (
  SELECT DISTINCT r.query_id, s.term
  FROM rawq r JOIN syn s ON s.qterm = r.qterm
  WHERE r.qterm <> ''
),
scored AS (
  SELECT qt.query_id, tdt.doc_id,
         round(sum(
           ln(1 + (cs.n_docs - ts.df + 0.5) / (ts.df + 0.5))
           * (tdt.tf * ({K1} + 1)) / (tdt.tf + {K1} * (1 - {B} + {B} * dl.dl / cs.avgdl))
         ), {SCORE_DECIMALS}) AS score
  FROM tdt
  JOIN qt ON tdt.term = qt.term
  JOIN ts ON tdt.term = ts.term
  JOIN dl ON tdt.doc_id = dl.doc_id
  CROSS JOIN cs
  GROUP BY qt.query_id, tdt.doc_id
)
SELECT query_id, doc_id, score FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
) WHERE rn <= {k}
"""


def search_topk_stopwords(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
    stop_words: set[str],
    k: int = 10,
) -> DataFrame:
    """Stop-word removal with the WORDS-rule interaction: stop words drop
    from the query BEFORE slot counting, so `the fast join` ranks docs by
    coverage of {fast, join} only (a doc with both outranks a doc with one
    plus 'the'). Delegates to the words-rule kernel over the filtered
    queries; a query of only stop words returns no rows (Meilisearch keeps
    placeholder search for the fully-empty query; a contentless query here
    is defined to match nothing). (query_id, doc_id, hit_terms, score)."""
    import re

    filtered: list[tuple[int, str]] = []
    for qid, q in queries:
        toks = [
            t
            for t in re.split(TOKEN_SPLIT_RE, q.lower())
            if t and t not in stop_words
        ]
        if toks:
            filtered.append((qid, " ".join(toks)))
    if not filtered:
        return spark.createDataFrame(
            [], "query_id int, doc_id long, hit_terms int, score double"
        )
    return search_topk_words(spark, index, filtered, k=k)


def sql_stopwords_topk(
    queries: list[tuple[int, str]],
    stop_words: set[str],
    k: int = 10,
) -> str:
    """DuckDB oracle for search_topk_stopwords: the words-rule oracle with
    the stop set filtered out of the query-term relation."""
    from grenad_spark.query.bm25 import bm25_words_oracle_sql

    stop_vals = ", ".join(f"('{s}')" for s in sorted(stop_words))
    base = bm25_words_oracle_sql(queries, k)
    # the qt clause sits on its own line ("\n  ) WHERE ..."); the tdt CTE
    # contains the same text inline, which this anchored needle skips
    needle = "\n  ) WHERE term <> ''"
    if base.count(needle) != 1:  # guard the splice against oracle refactors
        raise RuntimeError("words-oracle qt clause not found exactly once")
    return base.replace(
        needle,
        "\n  ) WHERE term <> '' "
        f"AND term NOT IN (SELECT s FROM (VALUES {stop_vals}) v(s))",
    )


# ---------------------------------------------------------------------------
# negative keywords — Meilisearch v1.8 query syntax: a word prefixed with
# `-` EXCLUDES every document containing it (docs.meilisearch.com "negative
# keywords"; grenad serves the exclusion set from the same word-docids DBs)
# ---------------------------------------------------------------------------

def parse_negative_query(q: str) -> tuple[list[str], list[str]]:
    """Split a raw query string into (positive_terms, negative_terms).
    A whitespace-token starting with `-` contributes its words to the
    negative set; everything else is positive. Both sides normalize through
    TOKEN_SPLIT_RE, so `-Slow!` excludes the term 'slow'."""
    import re

    pos: list[str] = []
    neg: list[str] = []
    for tok in q.split():
        is_neg = tok.startswith("-")
        for t in re.split(TOKEN_SPLIT_RE, tok.lstrip("-").lower()):
            if t:
                (neg if is_neg else pos).append(t)
    return pos, neg


def search_topk_negative(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
    k: int = 10,
) -> DataFrame:
    """Meilisearch NEGATIVE-KEYWORD serving: disjunctive BM25 top-k over the
    positive terms, minus every doc containing ANY `-`-prefixed term. The
    exclusion left-anti joins BEFORE the per-query window, so an excluded
    doc is replaced by the next-best — never a short result page.

    Scale: both sides ride the In(term)-pruned segments scan; the negative
    side decodes only its own posting blocks (work ∝ excluded-term posting
    size) and the anti-join keys on (query_id, doc_id) — co-partitioned
    with the scoring shuffle, no extra exchange shape. A query with only
    negative terms matches nothing (Meilisearch placeholder search is the
    documents scan, not an index query). (query_id, doc_id, score)."""
    pos_pairs: list[tuple[int, str]] = []
    neg_pairs: list[tuple[int, str]] = []
    seen: set[tuple[int, str, bool]] = set()
    for qid, q in queries:
        pos, neg = parse_negative_query(q)
        for t in pos:
            if (qid, t, False) not in seen:
                seen.add((qid, t, False))
                pos_pairs.append((qid, t))
        for t in neg:
            if (qid, t, True) not in seen:
                seen.add((qid, t, True))
                neg_pairs.append((qid, t))
    if not pos_pairs:
        return spark.createDataFrame([], "query_id int, doc_id long, score double")
    avgdl = float(index.avgdl)
    codec = index.payload_codec
    blocks, _ = _query_blocks_from_pairs(spark, index, pos_pairs)
    per_shard = blocks.select(
        "query_id", _qshard_col(spark, index), "term", "idf", "n", "first_doc", "last_doc",
        "max_tf", "min_dl", "payload",
    ).transform(lambda _d: _grouped_apply(_d, ["query_id", "shard"], 
        _make_exhaustive_with_termcount(avgdl, codec), _OUT_AND_SCHEMA
    ))
    if neg_pairs:
        nblocks, _ = _query_blocks_from_pairs(spark, index, neg_pairs)
        excluded = nblocks.select(
            "query_id", _qshard_col(spark, index), "term", "idf", "n", "first_doc", "last_doc",
            "max_tf", "min_dl", "payload",
        ).transform(lambda _d: _grouped_apply(_d, ["query_id", "shard"], 
            _make_exhaustive_with_termcount(avgdl, codec), _OUT_AND_SCHEMA
        )).select("query_id", "doc_id")
        per_shard = per_shard.join(excluded, ["query_id", "doc_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_shard.withColumn("score", F.round("score", SCORE_DECIMALS))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .select("query_id", "doc_id", "score")
    )


def sql_negative_topk(queries: list[tuple[int, str]], k: int = 10) -> str:
    """DuckDB oracle for search_topk_negative: the positive/negative term
    split baked as VALUES relations; exclusion via NOT EXISTS before the
    per-query ranking window."""
    from grenad_spark.functions.tokenize import sql_term_doc_tf
    from grenad_spark.query.bm25 import B, K1, SCORE_DECIMALS

    pos_rows, neg_rows = [], []
    for qid, q in queries:
        pos, neg = parse_negative_query(q)
        pos_rows += [f"({qid}, '{t}')" for t in sorted(set(pos))]
        neg_rows += [f"({qid}, '{t}')" for t in sorted(set(neg))]
    if not pos_rows:
        return "SELECT NULL::INT query_id, NULL::BIGINT doc_id, NULL::DOUBLE score WHERE false"
    neg_cte = (
        f"(VALUES {', '.join(neg_rows)}) AS n(query_id, term)"
        if neg_rows
        else "(SELECT NULL::INT AS query_id, NULL::VARCHAR AS term WHERE false) n"
    )
    return f"""
WITH tdt AS ({sql_term_doc_tf('documents')}),
dl AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '')) AS dl
  FROM documents
),
cs AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
ts AS (SELECT term, count(*)::DOUBLE AS df FROM tdt GROUP BY term),
qt AS (SELECT * FROM (VALUES {', '.join(pos_rows)}) AS p(query_id, term)),
nq AS (SELECT * FROM {neg_cte}),
excluded AS (
  SELECT DISTINCT nq.query_id, tdt.doc_id FROM tdt JOIN nq ON tdt.term = nq.term
),
scored AS (
  SELECT qt.query_id, tdt.doc_id,
         round(sum(
           ln(1 + (cs.n_docs - ts.df + 0.5) / (ts.df + 0.5))
           * (tdt.tf * ({K1} + 1)) / (tdt.tf + {K1} * (1 - {B} + {B} * dl.dl / cs.avgdl))
         ), {SCORE_DECIMALS}) AS score
  FROM tdt
  JOIN qt ON tdt.term = qt.term
  JOIN ts ON tdt.term = ts.term
  JOIN dl ON tdt.doc_id = dl.doc_id
  CROSS JOIN cs
  GROUP BY qt.query_id, tdt.doc_id
)
SELECT query_id, doc_id, score FROM (
  SELECT s.*, row_number() OVER (PARTITION BY s.query_id ORDER BY s.score DESC, s.doc_id ASC) AS rn
  FROM scored s
  WHERE NOT EXISTS (
    SELECT 1 FROM excluded e WHERE e.query_id = s.query_id AND e.doc_id = s.doc_id
  )
) WHERE rn <= {k}
"""


def parse_negative_phrases(q: str) -> tuple[str, list[str]]:
    """Extract `-"..."` segments (Meilisearch v1.8 negative PHRASES) from a
    raw query string. Returns (remaining query, phrase strings); the
    remainder still carries plain words and `-word` exclusions for
    parse_negative_query."""
    import re

    phrases = [m.group(1) for m in re.finditer(r'-"([^"]*)"', q)]
    rest = re.sub(r'-"[^"]*"', " ", q)
    return rest, [p for p in phrases if p.strip()]


def search_topk_negative_phrases(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
    k: int = 10,
) -> DataFrame:
    """Negative keywords AND negative phrases: disjunctive BM25 over the
    positive terms minus docs containing any `-word` term OR matching any
    `-"..."` phrase token-adjacently. Both exclusion sets anti-join BEFORE
    the per-query window, so excluded docs are replaced by next-best.

    Scale: the word sides ride In(term)-pruned segment scans; the phrase
    side is ONE batched In(term)-pruned positions scan + kernel pass
    (phrase.phrase_match_pairs) — work ∝ the excluded phrases' posting
    sizes, and the union'd exclusion keys on (query_id, doc_id),
    co-partitioned with the scoring shuffle."""
    from grenad_spark.query.phrase import phrase_match_pairs

    pos_pairs: list[tuple[int, str]] = []
    neg_pairs: list[tuple[int, str]] = []
    ph_pairs: list[tuple[int, str]] = []
    seen: set = set()
    for qid, q in queries:
        rest, phrases = parse_negative_phrases(q)
        pos, neg = parse_negative_query(rest)
        for t in pos:
            if (qid, t, "p") not in seen:
                seen.add((qid, t, "p"))
                pos_pairs.append((qid, t))
        for t in neg:
            if (qid, t, "n") not in seen:
                seen.add((qid, t, "n"))
                neg_pairs.append((qid, t))
        for p in sorted(set(phrases)):
            ph_pairs.append((qid, p))
    if not pos_pairs:
        return spark.createDataFrame([], "query_id int, doc_id long, score double")
    avgdl = float(index.avgdl)
    codec = index.payload_codec
    blocks, _ = _query_blocks_from_pairs(spark, index, pos_pairs)
    per_shard = blocks.select(
        "query_id", _qshard_col(spark, index), "term", "idf", "n", "first_doc", "last_doc",
        "max_tf", "min_dl", "payload",
    ).transform(lambda _d: _grouped_apply(_d, ["query_id", "shard"], 
        _make_exhaustive_with_termcount(avgdl, codec), _OUT_AND_SCHEMA
    ))
    exclusions: list[DataFrame] = []
    if neg_pairs:
        nblocks, _ = _query_blocks_from_pairs(spark, index, neg_pairs)
        exclusions.append(
            nblocks.select(
                "query_id", _qshard_col(spark, index), "term", "idf", "n", "first_doc",
                "last_doc", "max_tf", "min_dl", "payload",
            ).transform(lambda _d: _grouped_apply(_d, ["query_id", "shard"], 
                _make_exhaustive_with_termcount(avgdl, codec), _OUT_AND_SCHEMA
            )).select("query_id", "doc_id")
        )
    if ph_pairs:
        # phrase ids collide across queries only if the same qid repeats a
        # phrase — deduped above; the batch carries (qid, phrase) directly
        exclusions.append(phrase_match_pairs(spark, index, ph_pairs))
    for exc in exclusions:
        per_shard = per_shard.join(exc, ["query_id", "doc_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_shard.withColumn("score", F.round("score", SCORE_DECIMALS))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .select("query_id", "doc_id", "score")
    )


def sql_negative_phrases_topk(queries: list[tuple[int, str]], k: int = 10) -> str:
    """DuckDB oracle for search_topk_negative_phrases: word exclusions as a
    VALUES relation, phrase exclusions as substring containment over the
    space-joined normalized token stream (' t1 t2 ' contains ' p1 p2 '),
    both NOT EXISTS before the ranking window."""
    from grenad_spark.functions.tokenize import TOKEN_SPLIT_RE as TSR
    from grenad_spark.functions.tokenize import sql_term_doc_tf
    from grenad_spark.query.bm25 import B, K1, SCORE_DECIMALS

    import re

    pos_rows, neg_rows, ph_rows = [], [], []
    for qid, q in queries:
        rest, phrases = parse_negative_phrases(q)
        pos, neg = parse_negative_query(rest)
        pos_rows += [f"({qid}, '{t}')" for t in sorted(set(pos))]
        neg_rows += [f"({qid}, '{t}')" for t in sorted(set(neg))]
        for p in sorted(set(phrases)):
            toks = [t for t in re.split(TSR, p.lower()) if t]
            if toks:
                ph_rows.append(f"({qid}, ' {' '.join(toks)} ')")
    if not pos_rows:
        return "SELECT NULL::INT query_id, NULL::BIGINT doc_id, NULL::DOUBLE score WHERE false"
    neg_cte = (
        f"(VALUES {', '.join(neg_rows)}) AS n(query_id, term)"
        if neg_rows
        else "(SELECT NULL::INT AS query_id, NULL::VARCHAR AS term WHERE false) n"
    )
    ph_cte = (
        f"(VALUES {', '.join(ph_rows)}) AS p(query_id, pat)"
        if ph_rows
        else "(SELECT NULL::INT AS query_id, NULL::VARCHAR AS pat WHERE false) p"
    )
    return f"""
WITH tdt AS ({sql_term_doc_tf('documents')}),
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS t
  FROM documents
),
dl AS (SELECT doc_id, len(t) AS dl FROM toks),
cs AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
ts AS (SELECT term, count(*)::DOUBLE AS df FROM tdt GROUP BY term),
qt AS (SELECT * FROM (VALUES {', '.join(pos_rows)}) AS p(query_id, term)),
nq AS (SELECT * FROM {neg_cte}),
pq AS (SELECT * FROM {ph_cte}),
excluded AS (
  SELECT DISTINCT nq.query_id, tdt.doc_id FROM tdt JOIN nq ON tdt.term = nq.term
  UNION
  SELECT pq.query_id, toks.doc_id
  FROM toks CROSS JOIN pq
  WHERE contains(' ' || array_to_string(toks.t, ' ') || ' ', pq.pat)
),
scored AS (
  SELECT qt.query_id, tdt.doc_id,
         round(sum(
           ln(1 + (cs.n_docs - ts.df + 0.5) / (ts.df + 0.5))
           * (tdt.tf * ({K1} + 1)) / (tdt.tf + {K1} * (1 - {B} + {B} * dl.dl / cs.avgdl))
         ), {SCORE_DECIMALS}) AS score
  FROM tdt
  JOIN qt ON tdt.term = qt.term
  JOIN ts ON tdt.term = ts.term
  JOIN dl ON tdt.doc_id = dl.doc_id
  CROSS JOIN cs
  GROUP BY qt.query_id, tdt.doc_id
)
SELECT query_id, doc_id, score FROM (
  SELECT s.*, row_number() OVER (PARTITION BY s.query_id ORDER BY s.score DESC, s.doc_id ASC) AS rn
  FROM scored s
  WHERE NOT EXISTS (
    SELECT 1 FROM excluded e WHERE e.query_id = s.query_id AND e.doc_id = s.doc_id
  )
) WHERE rn <= {k}
"""


# ---------------------------------------------------------------------------
# matchingStrategy=last — Meilisearch's default word-dropping semantics:
# words are removed from the END of the query until a doc matches, so docs
# are bucketed by the LONGEST PREFIX of query words they contain entirely
# (a doc matching words {0,2} of a 3-word query sits in the prefix-1
# bucket — the gap at word 1 stops the prefix even though word 2 matched).
# Our words rule (search_topk_words) is matchingStrategy=frequency-ish
# (any-subset coverage count); this is the `last` strategy counterpart.
# ---------------------------------------------------------------------------

_TERM_MATCH_SCHEMA = "query_id int, doc_id long, term string, s double"


def _make_term_match_rows(avgdl: float, codec: str = "none"):
    """Per-shard decode that emits one row per (doc, matched term) with the
    term's full BM25 contribution — the building block when a consumer needs
    WHICH terms matched, not just how many."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        out = []
        for (term, idf), g in pdf.groupby(["term", "idf"], sort=False):
            d, tf, dl = decode_block_rows(
                decompress_payloads(list(g["payload"]), codec), g["n"].to_numpy()
            )
            s = float(idf) * _tfpart(tf.astype(np.float64), dl.astype(np.float64), avgdl)
            out.append(
                pd.DataFrame({"query_id": qid, "doc_id": d, "term": term, "s": s})
            )
        if not out:
            return pd.DataFrame(
                {
                    "query_id": pd.Series(dtype="int32"),
                    "doc_id": pd.Series(dtype="int64"),
                    "term": pd.Series(dtype="object"),
                    "s": pd.Series(dtype="float64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    return fn


def search_topk_matching_last(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
    k: int = 10,
) -> DataFrame:
    """matchingStrategy=last serving: rank by longest matched query-word
    PREFIX desc, then disjunctive BM25 over all matched terms, then doc_id.
    Docs not containing the first query word never match (prefix 0).

    Plan: one pruned-scan + kernel pass emits (doc, term, score-part) rows;
    a broadcast (query, term → slot) map attaches word positions; two
    same-keyed aggregations (slot set, score sum) reuse one (query_id,
    doc_id) partitioning. The sorted-distinct-slot prefix length is
    size(filter(transform(slots, (x,i) -> x = i))) — for a sorted distinct
    int array, arr[i] = i exactly on the leading gap-free run.
    (query_id, doc_id, matched_prefix, score)."""
    import re

    slot_rows: list[tuple[int, str, int]] = []
    pairs: list[tuple[int, str]] = []
    seen: set[tuple[int, str]] = set()
    for qid, q in queries:
        toks = [t for t in re.split(TOKEN_SPLIT_RE, q.lower()) if t]
        for slot, t in enumerate(toks):
            slot_rows.append((qid, t, slot))
            if (qid, t) not in seen:
                seen.add((qid, t))
                pairs.append((qid, t))
    return _matched_prefix_topk(spark, index, pairs, slot_rows, k)


def _matched_prefix_topk(
    spark: SparkSession,
    index: IndexHandle,
    pairs: list[tuple[int, str]],
    slot_rows: list[tuple[int, str, int]],
    k: int,
) -> DataFrame:
    """Shared word-dropping-strategy tail: given distinct (query, term)
    pairs and a (query, term → slot) drop-ORDER map (slot 0 = dropped
    last), rank docs by longest gap-free leading slot run, BM25, doc_id."""
    if not pairs:
        return spark.createDataFrame(
            [], "query_id int, doc_id long, matched_prefix int, score double"
        )
    blocks, _ = _query_blocks_from_pairs(spark, index, pairs)
    matches = blocks.select(
        "query_id", _qshard_col(spark, index), "term", "idf", "n", "first_doc", "last_doc",
        "max_tf", "min_dl", "payload",
    ).transform(lambda _d: _grouped_apply(_d, ["query_id", "shard"], 
        _make_term_match_rows(float(index.avgdl), index.payload_codec),
        _TERM_MATCH_SCHEMA,
    ))
    slot_df = spark.createDataFrame(slot_rows, "query_id int, term string, slot int")
    scores = matches.groupBy("query_id", "doc_id").agg(F.sum("s").alias("score"))
    slots = (
        matches.join(F.broadcast(slot_df), ["query_id", "term"])
        .groupBy("query_id", "doc_id")
        .agg(F.array_sort(F.collect_set("slot")).alias("slots"))
        .withColumn(
            "matched_prefix",
            F.expr("size(filter(transform(slots, (x, i) -> x = i), b -> b))"),
        )
    )
    j = slots.filter(F.col("matched_prefix") >= 1).join(
        scores, ["query_id", "doc_id"]
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("matched_prefix"), F.desc("score"), F.asc("doc_id")
    )
    return (
        j.withColumn("score", F.round("score", SCORE_DECIMALS))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .select("query_id", "doc_id", "matched_prefix", "score")
    )


def search_topk_matching_frequency(
    spark: SparkSession,
    index: IndexHandle,
    queries: list[tuple[int, str]],
    k: int = 10,
) -> DataFrame:
    """matchingStrategy=frequency (Meilisearch v1.8): words are dropped
    MOST-FREQUENT-FIRST (highest df), so docs are bucketed by the longest
    leading run of the rarity ordering they cover entirely — the same
    gap-free-run machinery as `last` with slots assigned by (df ASC, term
    ASC) rank instead of query position. An OOV term (df 0) is the rarest,
    sits at slot 0, and is never dropped: its query matches nothing —
    Meilisearch's dropping likewise never removes it.

    Scale: slot assignment needs df ONLY for the query's own terms — the
    driver-held df map when the vocabulary is map-gated, else a pruned
    In(term) term_dict scan collected to the driver (bounded by query word
    count, never by vocabulary). (query_id, doc_id, matched_prefix,
    score)."""
    pairs = _tokenize_queries(queries)
    if not pairs:
        return spark.createDataFrame(
            [], "query_id int, doc_id long, matched_prefix int, score double"
        )
    terms = sorted({t for _, t in pairs})
    dfm = index.df_map(spark)
    if dfm is not None:
        df_of = {t: int(dfm.get(t, 0)) for t in terms}
    else:
        got = (
            index.term_dict(spark)
            .filter(F.col("term").isin(terms))
            .select("term", "df")
            .collect()
        )
        known = {r["term"]: int(r["df"]) for r in got}
        df_of = {t: known.get(t, 0) for t in terms}
    by_query: dict[int, list[str]] = {}
    for qid, t in pairs:
        by_query.setdefault(qid, []).append(t)
    slot_rows: list[tuple[int, str, int]] = []
    for qid, ts in by_query.items():
        for slot, t in enumerate(sorted(ts, key=lambda t: (df_of[t], t))):
            slot_rows.append((qid, t, slot))
    return _matched_prefix_topk(spark, index, pairs, slot_rows, k)


def sql_matching_last_topk(queries: list[tuple[int, str]], k: int = 10) -> str:
    """DuckDB oracle for search_topk_matching_last: the (query, slot, term)
    word list as a VALUES relation; matched_prefix = the smallest uncovered
    slot (or the word count when every slot is covered)."""
    import re

    from grenad_spark.functions.tokenize import sql_term_doc_tf
    from grenad_spark.query.bm25 import B, K1, SCORE_DECIMALS

    tok_rows = []
    for qid, q in queries:
        toks = [t for t in re.split(TOKEN_SPLIT_RE, q.lower()) if t]
        tok_rows += [f"({qid}, {i}, '{t}')" for i, t in enumerate(toks)]
    if not tok_rows:
        return (
            "SELECT NULL::INT query_id, NULL::BIGINT doc_id, "
            "NULL::INT matched_prefix, NULL::DOUBLE score WHERE false"
        )
    return f"""
WITH tdt AS ({sql_term_doc_tf('documents')}),
dl AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '')) AS dl
  FROM documents
),
cs AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
ts AS (SELECT term, count(*)::DOUBLE AS df FROM tdt GROUP BY term),
qtok AS (SELECT * FROM (VALUES {', '.join(tok_rows)}) AS v(query_id, slot, term)),
qt AS (SELECT DISTINCT query_id, term FROM qtok),
matched AS (
  SELECT DISTINCT q.query_id, tdt.doc_id, q.slot
  FROM tdt JOIN qtok q ON tdt.term = q.term
),
slots AS (SELECT DISTINCT query_id, slot FROM qtok),
cov AS (
  SELECT s.query_id, d.doc_id, s.slot, (m.slot IS NOT NULL) AS hit
  FROM slots s
  JOIN (SELECT DISTINCT query_id, doc_id FROM matched) d ON d.query_id = s.query_id
  LEFT JOIN matched m
    ON m.query_id = s.query_id AND m.doc_id = d.doc_id AND m.slot = s.slot
),
lp AS (
  SELECT query_id, doc_id,
         coalesce(min(CASE WHEN NOT hit THEN slot END), count(*))::INT AS matched_prefix
  FROM cov GROUP BY 1, 2
),
scored AS (
  SELECT qt.query_id, tdt.doc_id,
         round(sum(
           ln(1 + (cs.n_docs - ts.df + 0.5) / (ts.df + 0.5))
           * (tdt.tf * ({K1} + 1)) / (tdt.tf + {K1} * (1 - {B} + {B} * dl.dl / cs.avgdl))
         ), {SCORE_DECIMALS}) AS score
  FROM tdt
  JOIN qt ON tdt.term = qt.term
  JOIN ts ON tdt.term = ts.term
  JOIN dl ON tdt.doc_id = dl.doc_id
  CROSS JOIN cs
  GROUP BY qt.query_id, tdt.doc_id
)
SELECT query_id, doc_id, matched_prefix, score FROM (
  SELECT l.query_id, l.doc_id, l.matched_prefix, s.score,
         row_number() OVER (PARTITION BY l.query_id
           ORDER BY l.matched_prefix DESC, s.score DESC, l.doc_id ASC) AS rn
  FROM lp l JOIN scored s ON s.query_id = l.query_id AND s.doc_id = l.doc_id
  WHERE l.matched_prefix >= 1
) WHERE rn <= {k}
"""


def sql_matching_frequency_topk(queries: list[tuple[int, str]], k: int = 10) -> str:
    """DuckDB oracle for search_topk_matching_frequency: slots assigned by
    (df ASC, term ASC) rank inside each query (df 0 for OOV terms —
    LEFT JOIN against ts), then the same smallest-uncovered-slot bucket
    logic as the `last` oracle."""
    import re

    from grenad_spark.functions.tokenize import sql_term_doc_tf
    from grenad_spark.query.bm25 import B, K1, SCORE_DECIMALS

    qt_rows = []
    for qid, q in queries:
        toks = {t for t in re.split(TOKEN_SPLIT_RE, q.lower()) if t}
        qt_rows += [f"({qid}, '{t}')" for t in sorted(toks)]
    if not qt_rows:
        return (
            "SELECT NULL::INT query_id, NULL::BIGINT doc_id, "
            "NULL::INT matched_prefix, NULL::DOUBLE score WHERE false"
        )
    return f"""
WITH tdt AS ({sql_term_doc_tf('documents')}),
dl AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '')) AS dl
  FROM documents
),
cs AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
ts AS (SELECT term, count(*)::DOUBLE AS df FROM tdt GROUP BY term),
qt AS (SELECT * FROM (VALUES {', '.join(qt_rows)}) AS v(query_id, term)),
qtok AS (
  SELECT query_id, term,
         (row_number() OVER (
            PARTITION BY query_id
            ORDER BY coalesce(ts.df, 0) ASC, qt.term ASC) - 1)::INT AS slot
  FROM qt LEFT JOIN ts USING (term)
),
matched AS (
  SELECT DISTINCT q.query_id, tdt.doc_id, q.slot
  FROM tdt JOIN qtok q ON tdt.term = q.term
),
slots AS (SELECT DISTINCT query_id, slot FROM qtok),
cov AS (
  SELECT s.query_id, d.doc_id, s.slot, (m.slot IS NOT NULL) AS hit
  FROM slots s
  JOIN (SELECT DISTINCT query_id, doc_id FROM matched) d ON d.query_id = s.query_id
  LEFT JOIN matched m
    ON m.query_id = s.query_id AND m.doc_id = d.doc_id AND m.slot = s.slot
),
lp AS (
  SELECT query_id, doc_id,
         coalesce(min(CASE WHEN NOT hit THEN slot END), count(*))::INT AS matched_prefix
  FROM cov GROUP BY 1, 2
),
scored AS (
  SELECT qt.query_id, tdt.doc_id,
         round(sum(
           ln(1 + (cs.n_docs - ts.df + 0.5) / (ts.df + 0.5))
           * (tdt.tf * ({K1} + 1)) / (tdt.tf + {K1} * (1 - {B} + {B} * dl.dl / cs.avgdl))
         ), {SCORE_DECIMALS}) AS score
  FROM tdt
  JOIN qt ON tdt.term = qt.term
  JOIN ts ON tdt.term = ts.term
  JOIN dl ON tdt.doc_id = dl.doc_id
  CROSS JOIN cs
  GROUP BY qt.query_id, tdt.doc_id
)
SELECT query_id, doc_id, matched_prefix, score FROM (
  SELECT l.query_id, l.doc_id, l.matched_prefix, s.score,
         row_number() OVER (PARTITION BY l.query_id
           ORDER BY l.matched_prefix DESC, s.score DESC, l.doc_id ASC) AS rn
  FROM lp l JOIN scored s ON s.query_id = l.query_id AND s.doc_id = l.doc_id
  WHERE l.matched_prefix >= 1
) WHERE rn <= {k}
"""


# ---------------------------------------------------------------------------
# highlighting — Meilisearch attributesToHighlight / _formatted: matched
# words wrapped in highlightPreTag/PostTag. Like phrase_snippets, the
# transform runs over the NORMALIZED token stream (tokens_col), so both
# engines wrap exactly the tokenizer's matches — no raw-text regex-engine
# parity risks (Java regex vs RE2 \b / case-folding differences).
# ---------------------------------------------------------------------------

def search_topk_highlight(
    spark: SparkSession,
    index: IndexHandle,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
) -> DataFrame:
    """Top-k BM25 with `_formatted`: the normalized text with every token
    equal to a query term wrapped in pre/post tags.

    Post-processing on k·|queries| rows only — the ranked page (with its
    per-query term array) broadcasts into the documents join and the wrap
    is one JVM transform over the token array; the 100 TB docs side is
    touched once, by doc_id join key. (query_id, doc_id, score,
    formatted)."""
    from grenad_spark.functions.tokenize import tokens_col

    topk = search_topk(spark, index, queries, k=k)
    qrows = []
    for qid, q in queries:
        ts = sorted({t for _, t in _tokenize_queries([(qid, q)])})
        if ts:
            qrows.append((qid, ts))
    if not qrows:
        return spark.createDataFrame(
            [], "query_id int, doc_id long, score double, formatted string"
        )
    qdf = spark.createDataFrame(qrows, "query_id int, qterms array<string>")
    pre, post = F.lit(pre_tag), F.lit(post_tag)
    j = (
        F.broadcast(topk.join(F.broadcast(qdf), "query_id"))
        .join(docs.select("doc_id", "text"), "doc_id")
        .withColumn("toks", tokens_col("text"))
        .withColumn(
            "formatted",
            F.array_join(
                F.transform(
                    F.col("toks"),
                    lambda t: F.when(
                        F.array_contains(F.col("qterms"), t),
                        F.concat(pre, t, post),
                    ).otherwise(t),
                ),
                " ",
            ),
        )
    )
    return j.select("query_id", "doc_id", "score", "formatted")


def sql_highlight_topk(
    queries: list[tuple[int, str]],
    k: int = 10,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
) -> str:
    """DuckDB oracle for search_topk_highlight — same normalized-token wrap
    (list_transform + list_contains over the tokenized text)."""
    from grenad_spark.query.bm25 import bm25_oracle_sql

    qrows = []
    for qid, q in queries:
        ts = sorted({t for _, t in _tokenize_queries([(qid, q)])})
        if ts:
            lit = "[" + ", ".join(f"'{t}'" for t in ts) + "]"
            qrows.append(f"({qid}, {lit})")
    return f"""
WITH topk AS ({bm25_oracle_sql(queries, k)}),
qn AS (SELECT * FROM (VALUES {', '.join(qrows)}) AS v(query_id, qterms)),
tk AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS toks
  FROM documents
)
SELECT t.query_id, t.doc_id, t.score,
       array_to_string(
         list_transform(tk.toks,
           x -> CASE WHEN list_contains(qn.qterms, x)
                     THEN '{pre_tag}' || x || '{post_tag}' ELSE x END),
         ' ') AS formatted
FROM topk t JOIN qn USING (query_id) JOIN tk USING (doc_id)
"""


def search_topk_crop(
    spark: SparkSession,
    index: IndexHandle,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    crop_length: int = 10,
    crop_marker: str = "…",
) -> DataFrame:
    """Top-k BM25 with `_formatted` CROPPING (Meilisearch attributesToCrop /
    cropLength / cropMarker): each hit's text reduced to a window of
    `crop_length` tokens centered on the FIRST occurrence of any query
    term, with `crop_marker` abutting whichever ends were trimmed.

    Window rule (both engines, over the normalized token stream): m = first
    1-based index of any query term; lo = max(1, m - (L-1)//2);
    hi = min(n, lo + L - 1); lo = max(1, hi - L + 1) — full-length windows
    clamped at both edges, like Meilisearch's crop around the best window.

    Post-processing on k·|queries| rows only: the ranked page broadcasts
    into the documents join (one doc_id-keyed touch of the 100 TB side)
    and the window arithmetic is pure JVM array exprs — no UDF, no extra
    shuffle. (query_id, doc_id, score, cropped)."""
    from grenad_spark.functions.tokenize import tokens_col

    topk = search_topk(spark, index, queries, k=k)
    qrows = []
    for qid, q in queries:
        ts = sorted({t for _, t in _tokenize_queries([(qid, q)])})
        if ts:
            qrows.append((qid, ts))
    if not qrows:
        return spark.createDataFrame(
            [], "query_id int, doc_id long, score double, cropped string"
        )
    qdf = spark.createDataFrame(qrows, "query_id int, qterms array<string>")
    half = (int(crop_length) - 1) // 2
    mk = crop_marker.replace("'", "''")
    j = (
        F.broadcast(topk.join(F.broadcast(qdf), "query_id"))
        .join(docs.select("doc_id", "text"), "doc_id")
        .withColumn("toks", tokens_col("text"))
        .withColumn("n", F.size("toks"))
        # first 1-based token index matching ANY query term (array_position
        # returns 0 for absent terms — filtered out before the min)
        .withColumn(
            "m",
            F.expr(
                "array_min(filter(transform(qterms,"
                " t -> array_position(toks, t)), p -> p > 0))"
            ).cast("int"),
        )
        .withColumn("lo0", F.greatest(F.lit(1), F.col("m") - half))
        .withColumn("hi", F.least(F.col("n"), F.col("lo0") + crop_length - 1))
        .withColumn("lo", F.greatest(F.lit(1), F.col("hi") - crop_length + 1))
        .withColumn(
            "cropped",
            F.concat(
                F.expr(f"CASE WHEN lo > 1 THEN '{mk}' ELSE '' END"),
                F.array_join(F.expr("slice(toks, lo, hi - lo + 1)"), " "),
                F.expr(f"CASE WHEN hi < n THEN '{mk}' ELSE '' END"),
            ),
        )
    )
    return j.select("query_id", "doc_id", "score", "cropped")


def sql_crop_topk(
    queries: list[tuple[int, str]],
    k: int = 10,
    crop_length: int = 10,
    crop_marker: str = "…",
) -> str:
    """DuckDB oracle for search_topk_crop — identical window arithmetic
    over the same normalized token stream (list_position / list_slice are
    1-based with 0-for-absent, exactly like Spark's array functions)."""
    from grenad_spark.query.bm25 import bm25_oracle_sql

    qrows = []
    for qid, q in queries:
        ts = sorted({t for _, t in _tokenize_queries([(qid, q)])})
        if ts:
            lit = "[" + ", ".join(f"'{t}'" for t in ts) + "]"
            qrows.append(f"({qid}, {lit})")
    half = (int(crop_length) - 1) // 2
    mk = crop_marker.replace("'", "''")
    return f"""
WITH topk AS ({bm25_oracle_sql(queries, k)}),
qn AS (SELECT * FROM (VALUES {', '.join(qrows)}) AS v(query_id, qterms)),
tk AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS toks
  FROM documents
),
win AS (
  SELECT t.query_id, t.doc_id, t.score, tk.toks, len(tk.toks) AS n,
         list_min(list_filter(list_transform(qn.qterms,
           x -> list_position(tk.toks, x)), p -> p > 0)) AS m
  FROM topk t JOIN qn USING (query_id) JOIN tk USING (doc_id)
),
win2 AS (
  SELECT *, least(n, greatest(1, m - {half}) + {crop_length} - 1) AS hi
  FROM win
),
win3 AS (SELECT *, greatest(1, hi - {crop_length} + 1) AS lo FROM win2)
SELECT query_id, doc_id, score,
       (CASE WHEN lo > 1 THEN '{mk}' ELSE '' END)
       || array_to_string(list_slice(toks, lo, hi), ' ')
       || (CASE WHEN hi < n THEN '{mk}' ELSE '' END) AS cropped
FROM win3
"""
