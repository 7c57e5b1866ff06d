"""grenad_spark — a PySpark-native inverted-index build + BM25 query engine.

A from-scratch re-expression of the capabilities of meilisearch/grenad
(`/root/reference`): external sort / merge / immutable sorted-KV machinery
(`src/sorter.rs`, `src/merger.rs`, `src/writer.rs`, `src/reader/`) rebuilt as
idiomatic Spark DataFrame programs — range-partitioned shuffle-sorts, mergeable
posting-list combiners in vectorized pandas/Arrow UDFs, delta+varbyte posting
blocks with block-max metadata, and BM25 top-k (exhaustive + block-max WAND).

Nothing in here is a port of the reference's Rust: Spark's shuffle IS grenad's
Sorter, Iceberg/parquet stats ARE its index footer, and Catalyst provides the
pruning its cursors hand-roll.
"""

__version__ = "0.1.0"
