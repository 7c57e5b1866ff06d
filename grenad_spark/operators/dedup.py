"""Deduplication operators over the documents table.

Five dedup families, all expressed as declarative DataFrame programs so
Catalyst handles pushdown/pruning; the only UDF-free exception is nothing —
every operator here is 100% JVM-side (built-in functions), which is what
makes them viable at 10^12 docs:

- exact:        hash-groupBy on md5(text) — one shuffle, map-side partial agg
- ngram_jaccard: shingle set self-join — shuffle keyed on shingle; frequent-
                 shingle skew is bounded by dropping top-percentile shingles
                 (standard web-dedup practice) — not needed at test scale
- minhash_lsh:  H md5-derived hash fns → per-band bucket join — candidate
                 pairs only, verified by true Jaccard
- simhash:      32-bit fingerprint via per-bit weighted majority — 32 agg
                 expressions, no row explosion
- embedding:    cosine over array<float> via zip_with/aggregate

Cross-engine hashing: h_i(s) = int(md5(i || ':' || s)[:8], 16) — identical in
Spark (conv/substring/md5) and DuckDB (('0x'||substr(md5,1,8))::BIGINT), so
every operator has a value-exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from grenad_spark.functions.tokenize import TOKEN_SPLIT_RE, tokens_col

NGRAM_N = 3
MINHASH_FNS = 12
LSH_BANDS = 4  # 12 hashes / 4 bands = 3 rows per band
SIMHASH_BITS = 32


def md5_hash64(col: Column, salt: int | None = None) -> Column:
    """First 8 hex chars of md5 as an unsigned int — engine-portable."""
    inp = col if salt is None else F.concat(F.lit(f"{salt}:"), col)
    return F.conv(F.substring(F.md5(inp), 1, 8), 16, 10).cast("long")


def sql_md5_hash64(expr: str, salt: int | None = None) -> str:
    inp = expr if salt is None else f"'{salt}:' || {expr}"
    return f"('0x' || substr(md5({inp}), 1, 8))::BIGINT"


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """(text_hash, rep_doc, n_dups) for every duplicated text."""
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("rep_doc"), F.count("*").cast("long").alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


SQL_EXACT_DEDUP = (
    "SELECT md5(text) AS text_hash, min(doc_id) AS rep_doc, count(*)::BIGINT AS n_dups "
    "FROM documents GROUP BY md5(text) HAVING count(*) > 1"
)


def exact_dedup_keep_first(docs: DataFrame) -> DataFrame:
    """Surviving doc_ids after exact dedup (keep lowest doc_id per text).

    Groups on md5(text) — 16 bytes — NOT raw text: at 100 TB a groupBy("text")
    shuffle carries the whole corpus; the digest shuffle carries ~0.01% of it.
    """
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )


SQL_EXACT_KEEP_FIRST = "SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)"


def prefix_dedup_groups(docs: DataFrame, n_prefix: int = 8) -> DataFrame:
    """Exact dedup on the first n_prefix tokens — catches boilerplate-headed
    near-dups; same hash-groupBy shape as exact dedup but on a canonicalized
    key (the corpus has no full-text dups, so this exercises nonzero groups)."""
    toks = tokens_col("text")
    key = F.md5(F.concat_ws(" ", F.slice(toks, 1, n_prefix)))
    return (
        docs.groupBy(key.alias("prefix_hash"))
        .agg(F.min("doc_id").alias("rep_doc"), F.count("*").cast("long").alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


def sql_prefix_dedup(n_prefix: int = 8) -> str:
    return f"""
SELECT md5(array_to_string(toks[1:{n_prefix}], ' ')) AS prefix_hash,
       min(doc_id) AS rep_doc, count(*)::BIGINT AS n_dups
FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS toks
      FROM documents)
GROUP BY 1 HAVING count(*) > 1
"""


# ---------------------------------------------------------------------------
# shingles + n-gram Jaccard
# ---------------------------------------------------------------------------

def shingles(docs: DataFrame, n: int = NGRAM_N, distinct: bool = True) -> DataFrame:
    """(doc_id, shingle) word n-grams, entirely JVM-side. distinct=True (the
    Jaccard/MinHash contract) costs a corpus-wide aggregate; pass False when
    duplicates are harmless (e.g. the probe side of a semi-join) — the
    explode is then a narrow map with NO shuffle."""
    toks = tokens_col("text")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    out = docs.filter(F.size(toks) >= n).select(
        "doc_id", F.explode(sh).alias("shingle")
    )
    return out.distinct() if distinct else out


def sql_shingles(n: int = NGRAM_N, table: str = "documents") -> str:
    return f"""
SELECT DISTINCT doc_id, array_to_string(toks[i + 1 : i + {n}], ' ') AS shingle
FROM (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS toks
  FROM {table}
), unnest(generate_series(0, len(toks) - {n})) AS t(i)
WHERE len(toks) >= {n}
"""


DEFAULT_MAX_SHINGLE_DF = 1000


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = NGRAM_N,
    max_df: int = DEFAULT_MAX_SHINGLE_DF,
    log_dropped: bool = False,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs sharing ≥1 shingle with J ≥ threshold.

    Shuffle keyed on shingle; |pairs| bounded by co-occurrence. HOT-SHINGLE
    CAP: shingles appearing in more than max_df docs are dropped BEFORE the
    self-join (standard web-dedup practice — one boilerplate shingle shared by
    10^8 docs would otherwise make a 10^16-row join key). Jaccard is computed
    over the CAPPED shingle sets (sizes counted after the drop), so the
    semantics are "similarity of the discriminative shingles". At the test SF
    (500 docs < max_df) nothing drops and this equals uncapped Jaccard.
    """
    sh_all = shingles(docs, n)
    sdf = sh_all.groupBy("shingle").agg(F.count("*").alias("sdf"))
    if log_dropped:
        n_hot = sdf.filter(F.col("sdf") > max_df).count()
        n_tot = sdf.count()
        print(
            f"ngram_jaccard_pairs: dropped {n_hot}/{n_tot} shingles with "
            f"df > {max_df} before the self-join",
            flush=True,
        )
    # attach df and filter — an equi-join on the SAME key as the self-join
    # below (co-partitionable, no broadcast-size assumption on the hot set)
    sh = (
        sh_all.join(sdf, "shingle")
        .filter(F.col("sdf") <= max_df)
        .select("doc_id", "shingle")
        .cache()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("sa"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("sb"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("sa") + F.col("sb") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def sql_ngram_jaccard(
    threshold: float = 0.8, n: int = NGRAM_N, max_df: int = DEFAULT_MAX_SHINGLE_DF
) -> str:
    return f"""
WITH sh_all AS ({sql_shingles(n)}),
sh AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS sdf FROM sh_all
  ) WHERE sdf <= {max_df}
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT doc_a, doc_b,
         round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
) WHERE jaccard >= {threshold}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(docs: DataFrame, h: int = MINHASH_FNS) -> DataFrame:
    """(doc_id, sig) with sig = array of h min-hashes over the shingle set.

    One shuffle (groupBy doc) with h JVM-side min() aggs — no UDF, no
    per-hash explosion."""
    sh = shingles(docs)
    aggs = [F.min(md5_hash64(F.col("shingle"), i)).alias(f"h{i}") for i in range(h)]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select("doc_id", F.array(*[f"h{i}" for i in range(h)]).alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = 0.5, h: int = MINHASH_FNS, bands: int = LSH_BANDS
) -> DataFrame:
    """Candidate pairs from band-bucket collisions, verified by signature
    similarity (fraction of agreeing hashes ≥ threshold)."""
    r = h // bands
    sig = minhash_signatures(docs, h).cache()
    bands_df = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.concat_ws(",", *[F.col("sig")[bi * r + j].cast("string") for j in range(r)]).alias("bucket"),
                )
                for bi in range(bands)
            ])
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    cand = (
        bands_df.alias("a")
        .join(bands_df.alias("b"), ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "sim",
            F.round(
                F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
                / F.lit(float(h)),
                6,
            ),
        )
        .filter(F.col("sim") >= threshold)
        .select("doc_a", "doc_b", "sim")
    )


def sql_minhash_lsh(threshold: float = 0.5, h: int = MINHASH_FNS, bands: int = LSH_BANDS) -> str:
    r = h // bands
    mins = ", ".join(f"min({sql_md5_hash64('shingle', i)}) AS h{i}" for i in range(h))
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band, "
        + " || ',' || ".join(f"h{bi * r + j}::VARCHAR" for j in range(r))
        + " AS bucket FROM sig"
        for bi in range(bands)
    )
    eq_count = " + ".join(f"(sa.h{i} = sb.h{i})::INT" for i in range(h))
    return f"""
WITH sh AS ({sql_shingles()}),
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, sim FROM (
  SELECT doc_a, doc_b, round(({eq_count}) / {float(h)}, 6) AS sim
  FROM cand
  JOIN sig sa ON sa.doc_id = doc_a
  JOIN sig sb ON sb.doc_id = doc_b
) WHERE sim >= {threshold}
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash) — per-bit weighted majority over token hashes.

    bits aggregate expressions on one (doc, token, tf) shuffle; the fingerprint
    is assembled JVM-side with shiftleft/bitwise-or."""
    toks = (
        docs.select("doc_id", F.explode(tokens_col("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
        .withColumn("th", md5_hash64(F.col("tok")))
    )
    bit_aggs = [
        F.sum(
            F.col("tf") * (F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    per_doc = toks.groupBy("doc_id").agg(*bit_aggs)
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return per_doc.select("doc_id", fp.cast("long").alias("simhash"))


def sql_simhash(bits: int = SIMHASH_BITS) -> str:
    bit_sums = ", ".join(
        f"sum(tf * (((th // {2**b}) % 2) * 2 - 1)) AS s{b}" for b in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN s{b} > 0 THEN {2**b} ELSE 0 END)" for b in range(bits))
    return f"""
WITH toks AS (
  SELECT doc_id, term AS tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}')) AS term FROM documents)
  WHERE term <> '' GROUP BY doc_id, term
),
hashed AS (SELECT doc_id, tf, {sql_md5_hash64('tok')} AS th FROM toks),
per_doc AS (SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id)
SELECT doc_id, ({fp})::BIGINT AS simhash FROM per_doc
"""


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def _cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


EMB_DEDUP_PLANES = 32
EMB_DEDUP_BANDS = 16  # r = 2 bits/band — tuned for the near-uniform synthetic
# vectors at threshold ~0.45 (recall 14/14 vs the all-pairs oracle at sf0.01);
# production near-dup thresholds (≥0.95) run longer bands for far sharper
# bucket selectivity (p_bit ≈ 0.9 ⇒ r=8 bands still collide w.p. ~0.43)


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = EMB_DEDUP_PLANES,
    bands: int = EMB_DEDUP_BANDS,
    dim: int | None = None,
    exact: bool = False,
) -> DataFrame:
    """(vec_a, vec_b, cos) pairs with cosine ≥ threshold — LSH-BUCKETED:
    candidate pairs come from integer-hyperplane band-bucket collisions
    (operators/ann.py machinery), then exact cosine rerank on candidates
    only. NO all-pairs join anywhere in the plan: at 10^9 vectors the
    bucket self-join touches only colliding pairs. The brute-force all-pairs
    variant survives as the TEST oracle (embedding_dup_pairs_bruteforce;
    equality asserted in tests/test_dedup_ann.py).

    RECALL BOUND (probabilistic — retune band params per threshold): a pair
    at cosine c collides in one r-plane band w.p. p^r where p = 1 - acos(c)/π,
    and misses EVERY band w.p. (1 - p^r)^bands. With the defaults (32 planes,
    16 bands, r=2): miss ≈ 1.6e-4 at c=0.45 but the bound is per-threshold —
    deduping at c ≥ 0.95 (p ≈ 0.90) should run LONGER bands (r=8+) for
    selectivity, and fewer of them still keeps miss < 1e-4. Pass exact=True
    (all-pairs; O(n²), small inputs only) when recall must be 1.0."""
    if exact:
        return embedding_dup_pairs_bruteforce(emb, threshold)
    from grenad_spark.operators.ann import band_rows, infer_dim, int_planes

    planes = int_planes(dim if dim is not None else infer_dim(emb), n_planes)
    b = band_rows(emb, "vec_id", planes, bands, keep=[])
    cand = (
        b.alias("a")
        .join(b.alias("b"), ["band", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    v = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    va = v.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    vb = v.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn("cos", F.round(_cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )


def embedding_dup_pairs_bruteforce(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """All-pairs baseline — O(n²), TEST ORACLE ONLY (kept to assert the
    bucketed plan's recall; never registered as a contract query)."""
    v = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", F.round(_cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )


def sql_embedding_dups(
    threshold: float = 0.95,
    n_planes: int = EMB_DEDUP_PLANES,
    bands: int = EMB_DEDUP_BANDS,
) -> str:
    """DuckDB mirror of the BUCKETED plan (identical candidate generation, so
    the contract hash matches by construction)."""
    from grenad_spark.operators.ann import (
        EMB_DIM,
        QUANT,
        int_planes,
        sql_band_union,
        sql_signature_bits,
    )

    planes = int_planes(EMB_DIM, n_planes)
    bits = sql_signature_bits(planes, "qv")
    bit_cols = ", ".join(f"{b} AS s{i}" for i, b in enumerate(bits))
    return f"""
WITH base AS (SELECT vec_id, list_transform(embedding, x -> round(x::DOUBLE * {QUANT})) AS qv FROM embeddings),
sig AS (SELECT vec_id, {bit_cols} FROM base),
bands AS ({sql_band_union(planes, bands, "sig", "vec_id")}),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cos FROM (
  SELECT c.vec_a, c.vec_b,
         round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) AS cos
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.vec_a
  JOIN embeddings eb ON eb.vec_id = c.vec_b
) WHERE cos >= {threshold}
"""


# ---------------------------------------------------------------------------
# near-dup clustering (connected components over the pair graph)
# ---------------------------------------------------------------------------

def dup_clusters(pairs: DataFrame, max_iters: int = 25) -> DataFrame:
    """(doc_id, cluster_id) connected components over a near-dup pair set —
    what a dedup pipeline actually consumes (keep one doc per CLUSTER, not
    per pair; pairs alone under-remove on transitive near-dups A~B~C).
    cluster_id = the smallest doc_id reachable.

    Iterative min-label propagation: each round is one doc-keyed
    co-partitioned join + min-aggregate (work ∝ |edges|), and the number of
    rounds is the graph diameter — tiny for near-dup graphs, whose
    components are near-cliques (threshold similarity is near-transitive).
    Convergence is detected by the monotone Σcomp invariant (labels only
    ever decrease; equal sums ⇔ fixpoint), one scalar agg per round — no
    row-level diff join. A pathological long-chain graph would need
    large-star/small-star doubling (O(log n) rounds); max_iters guards it
    loudly instead of silently mislabeling."""
    # Checkpoint EVERY round: comp appears twice in each round's plan (as
    # the label side and inside nbr), so without lineage truncation the
    # logical plan DOUBLES per round — exponential, and the driver OOMs
    # planning round ~10 on moderate-diameter graphs (Hypothesis-caught).
    # RELIABLE checkpoint (survives executor loss) when the session has a
    # checkpoint dir configured — the right setting on a cluster with
    # dynamic allocation / spot nodes; localCheckpoint otherwise (single
    # local JVM: executor loss == job loss anyway, and it avoids requiring
    # a checkpoint dir for local runs).
    sc = pairs.sparkSession.sparkContext
    try:
        reliable = sc.getCheckpointDir() is not None
    except Exception:
        reliable = False
    _ckpt = (lambda df: df.checkpoint()) if reliable else (lambda df: df.localCheckpoint())

    e = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    # Materialize the symmetric edge set ONCE before the loop: edges feed
    # every round's nbr join AND every round's checkpoint, so an
    # unmaterialized edge frame re-executes the whole upstream pair pipeline
    # (shingles → MinHash → band self-join) once per round — per-round cost
    # at production scale would be a full MinHash recompute, contradicting
    # the documented work ∝ |edges| contract.
    edges = _ckpt(
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    )
    comp = _ckpt(
        edges.groupBy("src").agg(F.min("dst").alias("m")).select(
            F.col("src").alias("node"),
            F.least(F.col("src"), F.col("m")).alias("comp"),
        )
    )

    def _finish(c: DataFrame) -> DataFrame:
        return c.select(
            F.col("node").alias("doc_id"),
            F.col("comp").cast("long").alias("cluster_id"),
        )

    prev_sum = comp.agg(F.sum("comp")).first()[0]
    if prev_sum is None:  # no duplicate pairs at all
        return _finish(comp)
    for _ in range(max_iters):
        nbr = (
            edges.join(comp.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("comp").alias("nc"))
            .withColumnRenamed("src", "node")
        )
        comp = _ckpt(
            comp.join(nbr, "node", "left").select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("nc"), F.col("comp"))).alias("comp"),
            )
        )
        new_sum = comp.agg(F.sum("comp")).first()[0]
        if new_sum == prev_sum:
            return _finish(comp)
        prev_sum = new_sum
    raise RuntimeError(
        f"dup_clusters did not converge in {max_iters} rounds — graph diameter "
        f"exceeds the near-dup assumption; use star-doubling for chain graphs"
    )


def sql_dup_clusters(threshold: float = 0.5) -> str:
    """DuckDB oracle: transitive closure by recursive CTE over the SAME
    bucketed MinHash pair set, then min reachable per node. Closure is
    O(component²) — fine for the oracle's small scale, never for the engine."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({sql_minhash_lsh(threshold)})
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, t.r FROM edges e JOIN reach t ON t.node = e.dst
)
SELECT node::BIGINT AS doc_id, min(r)::BIGINT AS cluster_id FROM reach GROUP BY node
"""
