"""Merge-function registry — grenad's `MergeFunction` trait as Spark combiners.

Reference semantics reproduced exactly (SURVEY §2.3):
- `keep_first` / `keep_last`: enabled by the deterministic source-index
  tie-break of the heap merge (src/merger.rs:51-57) — here an explicit
  (source_id, seq) ordering column, because Spark shuffle arrival order is
  NOT deterministic and must never leak into results.
- `concat`: values concatenated in (source_id, seq) order
  (src/sorter.rs:768-781 ConcatMerger; stability asserted by the reference's
  correct_key_ordering test, src/sorter.rs:841-885).
- `wrapping_sum_u32`: u32 wrapping sum (doc example src/lib.rs:81-94).

All are single-shuffle groupBy aggregations (partial+final agg under the
hood — grenad's write_chunk/merge_chunks split, done by Tungsten). The KV
frame contract: columns (key, value, source_id, seq); key/value types are the
caller's (grenad keys are opaque bytes — Spark is schema-full, so callers
bring typed columns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

U32_MODULUS = 2**32


def _ordered_values(value: str | Column) -> Column:
    """collect values ordered by (source_id, seq) — the deterministic
    arrival order the reference guarantees via its stable sort + heap
    tie-break."""
    v = F.col(value) if isinstance(value, str) else value
    return F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("source_id"), F.col("seq"), v.alias("v")))),
        lambda s: s["v"],
    )


def merge_keep_first(kv: DataFrame, key: str = "key", value: str = "value") -> DataFrame:
    return kv.groupBy(key).agg(_ordered_values(value)[0].alias(value))


def merge_keep_last(kv: DataFrame, key: str = "key", value: str = "value") -> DataFrame:
    vals = _ordered_values(value)
    return kv.groupBy(key).agg(F.element_at(vals, F.size(vals)).alias(value))


def merge_concat(
    kv: DataFrame, key: str = "key", value: str = "value", sep: str = ""
) -> DataFrame:
    return kv.groupBy(key).agg(F.array_join(_ordered_values(value), sep).alias(value))


def merge_wrapping_sum_u32(kv: DataFrame, key: str = "key", value: str = "value") -> DataFrame:
    return kv.groupBy(key).agg(
        (F.sum(value) % U32_MODULUS).cast("long").alias(value)
    )


MERGE_FUNCTIONS = {
    "keep_first": merge_keep_first,
    "keep_last": merge_keep_last,
    "concat": merge_concat,
    "wrapping_sum_u32": merge_wrapping_sum_u32,
}


def sorted_run(kv: DataFrame, num_partitions: int, key: str = "key") -> DataFrame:
    """Materialize the grenad 'sorted immutable run' shape: globally ordered
    across range partitions, sorted within (Writer::insert key-order
    contract, src/block_writer.rs:109)."""
    return kv.repartitionByRange(num_partitions, key).sortWithinPartitions(key)


def merge_sorted_union(
    sources: list[DataFrame], merge_name: str, num_partitions: int = 8,
    key: str = "key", value: str = "value",
) -> DataFrame:
    """Merger over N sources (src/merger.rs:88-196): sorted union-all with a
    single combine per key. Each source i gets source_id=i (the heap's
    source-index tie-break)."""
    tagged = [
        s.withColumn("source_id", F.lit(i)) if "source_id" not in s.columns else s
        for i, s in enumerate(sources)
    ]
    union = tagged[0]
    for s in tagged[1:]:
        union = union.unionByName(s)
    if merge_name not in MERGE_FUNCTIONS:
        from grenad_spark.errors import MergeError

        raise MergeError(
            f"unknown merge function {merge_name!r}; registered: "
            f"{sorted(MERGE_FUNCTIONS)}"
        )
    merged = MERGE_FUNCTIONS[merge_name](union, key, value)
    return sorted_run(merged, num_partitions, key)
