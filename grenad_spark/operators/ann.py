"""Similarity search over the embeddings table (array<float> column).

- brute_force_topk: exact cosine top-k per query — the correctness baseline,
  expressed with zip_with/aggregate (JVM-side) + window top-k. At scale this
  is one broadcast of the query set and a single pass over the vectors:
  O(n·q·d) flops inside codegen, no shuffle until the k·q-row reduction.
- lsh_topk: random-hyperplane LSH bucketing as the scale path: probe only
  vectors sharing ≥1 hyperplane-sign band with the query, then exact rerank.
  Recall measured against brute force in tests (not an oracle query — the
  planes come from a seeded RNG, deliberately engine-local).
- ivf_topk: inverted-file variant — coarse-quantize to the nearest of C
  deterministic centroids, probe the nprobe nearest cells, exact rerank.

Query set: the first N_QUERIES vectors by vec_id (deterministic).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_QUERIES = 5
DEFAULT_K = 10
LSH_PLANES = 16
LSH_BANDS = 4
SEED = 42


def _as_double(emb: DataFrame, col: str = "embedding") -> DataFrame:
    return emb.withColumn("v", F.transform(col, lambda x: x.cast("double")))


def _cos(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, v: s + v * v))
    return dot / (na * nb)


def query_vectors(emb: DataFrame, n_queries: int = N_QUERIES) -> DataFrame:
    return _as_double(emb).filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )


def brute_force_topk(emb: DataFrame, k: int = DEFAULT_K, n_queries: int = N_QUERIES) -> DataFrame:
    """(query_id, vec_id, cos) exact top-k; excludes the query vector itself.
    Ranking on rounded cosine + vec_id for cross-engine determinism."""
    q = query_vectors(emb, n_queries)
    v = _as_double(emb).select("vec_id", "v")
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", F.round(_cos(F.col("qv"), F.col("v")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cos")
    )


def sql_brute_force_topk(k: int = DEFAULT_K, n_queries: int = N_QUERIES) -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6) AS cos
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rn
  FROM scored
) WHERE rn <= {k}
"""


def _planes(dim: int, n_planes: int = LSH_PLANES) -> list[list[float]]:
    rng = np.random.default_rng(SEED)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(v, planes: list[list[float]]):
    """Array of sign bits (0/1) of ⟨v, plane_i⟩, JVM-side."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(v, F.array(*[F.lit(x) for x in p]), lambda a, b: a * b),
                F.lit(0.0),
                lambda s, x: s + x,
            )
            > 0,
            1,
        )
        .otherwise(0)
        for p in planes
    ]
    return F.array(*bits)


def lsh_topk(
    emb: DataFrame,
    k: int = DEFAULT_K,
    n_queries: int = N_QUERIES,
    n_planes: int = LSH_PLANES,
    bands: int = LSH_BANDS,
    dim: int | None = None,
) -> DataFrame:
    """Banded random-hyperplane LSH: candidates share ≥1 band of plane signs
    with the query; exact cosine rerank on candidates only."""
    if dim is None:
        dim = len(emb.select("embedding").first()[0])
    planes = _planes(dim, n_planes)
    r = n_planes // bands
    v = _as_double(emb).select("vec_id", "v").withColumn("sig", lsh_signature(F.col("v"), planes))

    def band_rows(df, idc, sigc):
        return df.select(
            idc,
            "v" if "v" in df.columns else sigc,
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws("", *[F.col(sigc)[bi * r + j].cast("string") for j in range(r)]).alias("bucket"),
                    )
                    for bi in range(bands)
                ])
            ).alias("bb"),
        ).select(idc, "v", "bb.band", "bb.bucket")

    vb = band_rows(v, "vec_id", "sig")
    q = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("sig")
    )
    qb = q.select(
        "query_id", "qv",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.concat_ws("", *[F.col("sig")[bi * r + j].cast("string") for j in range(r)]).alias("bucket"),
                )
                for bi in range(bands)
            ])
        ).alias("bb"),
    ).select("query_id", "qv", "bb.band", "bb.bucket")
    cand = (
        vb.join(F.broadcast(qb), ["band", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qv", "vec_id", "v")
        .distinct()
    )
    scored = cand.withColumn("cos", F.round(_cos(F.col("qv"), F.col("v")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cos")
    )


def ivf_topk(
    emb: DataFrame,
    k: int = DEFAULT_K,
    n_queries: int = N_QUERIES,
    n_cells: int = 8,
    nprobe: int = 3,
) -> DataFrame:
    """IVF: centroids = the last n_cells vectors (deterministic, disjoint from
    the query set); assign each vector to its nearest centroid; probe the
    nprobe nearest cells per query; exact rerank inside probed cells."""
    v = _as_double(emb).select("vec_id", "v")
    max_id = emb.agg(F.max("vec_id")).first()[0]
    cents = (
        v.filter(F.col("vec_id") > max_id - n_cells)
        .select(F.col("vec_id").alias("cell_id"), F.col("v").alias("cv"))
    )
    assign_w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cell_id"))
    assigned = (
        v.crossJoin(F.broadcast(cents))
        .withColumn("ccos", F.round(_cos(F.col("v"), F.col("cv")), 6))
        .withColumn("rn", F.row_number().over(assign_w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cell_id")
    )
    q = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    probe_w = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("cell_id"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("qcos", F.round(_cos(F.col("qv"), F.col("cv")), 6))
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "cell_id")
    )
    cand = assigned.join(F.broadcast(probes), "cell_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.withColumn("cos", F.round(_cos(F.col("qv"), F.col("v")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cos")
    )
