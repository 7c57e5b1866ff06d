"""End-to-end training-data curation: the composed pipeline a 100 TB corpus
actually runs before pre-training — language filter + quality threshold +
near-duplicate removal — expressed as ONE declarative DataFrame program so
Catalyst fuses the whole chain (each stage is an existing oracle-gated
operator; the composition is itself oracle-gated).

Scale shape: lang/quality are pure column expressions over one documents
scan (no shuffle until the dedup anti-join); the dedup side is the
MinHash-LSH candidate machinery (bucketed, never all-pairs); survivors flow
out as a doc_id column — downstream training jobs semi-join it against the
corpus, so the full text never re-shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grenad_spark.functions import textstats
from grenad_spark.operators import dedup

DEFAULT_MIN_QUALITY = 0.45
DEFAULT_DUP_SIM = 0.5


def curate(
    docs: DataFrame,
    lang: str = "en",
    min_quality: float = DEFAULT_MIN_QUALITY,
    dup_sim: float = DEFAULT_DUP_SIM,
    cluster_dedup: bool = False,
) -> DataFrame:
    """(doc_id, quality) of documents that survive curation: predicted
    language == lang, quality >= min_quality, and near-dup removal.

    cluster_dedup=False: drop the GREATER side of each MinHash-LSH pair —
    one pass, but a component like {3,5,9} with pairs (5,9),(3,9) keeps BOTH
    3 and 5 (each lacks a smaller direct neighbor): pair-local selection
    under-removes on transitive chains.
    cluster_dedup=True: connected components over the pair graph
    (dedup.dup_clusters) and keep exactly the min doc of each cluster — the
    keep-one-per-CLUSTER semantics a production corpus dedup wants."""
    q = textstats.quality_score(docs).select("doc_id", "quality")
    lg = textstats.lang_id(docs).select("doc_id", "pred_lang")
    pairs = dedup.minhash_lsh_pairs(docs, dup_sim)
    if cluster_dedup:
        dup_b = (
            dedup.dup_clusters(pairs)
            .filter(F.col("cluster_id") != F.col("doc_id"))
            .select("doc_id")
        )
    else:
        dup_b = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return (
        docs.select("doc_id")
        .join(q, "doc_id")
        .join(lg, "doc_id")
        .filter((F.col("pred_lang") == lang) & (F.col("quality") >= min_quality))
        .join(dup_b, "doc_id", "left_anti")
        .select("doc_id", "quality")
    )


def sql_curate(
    lang: str = "en",
    min_quality: float = DEFAULT_MIN_QUALITY,
    dup_sim: float = DEFAULT_DUP_SIM,
    cluster_dedup: bool = False,
) -> str:
    if cluster_dedup:
        dup_cte = (
            f"SELECT doc_id FROM ({dedup.sql_dup_clusters(dup_sim)}) "
            f"WHERE cluster_id <> doc_id"
        )
    else:
        dup_cte = (
            f"SELECT DISTINCT doc_b AS doc_id FROM ({dedup.sql_minhash_lsh(dup_sim)})"
        )
    return f"""
WITH q AS ({textstats.sql_quality_score()}),
l AS ({textstats.sql_lang_id()}),
dup AS ({dup_cte})
SELECT d.doc_id, q.quality
FROM documents d
JOIN q ON q.doc_id = d.doc_id
JOIN l ON l.doc_id = d.doc_id
WHERE l.pred_lang = '{lang}' AND q.quality >= {min_quality}
  AND d.doc_id NOT IN (SELECT doc_id FROM dup)
"""
