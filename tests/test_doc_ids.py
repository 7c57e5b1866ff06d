"""Deterministic doc_id assignment: partitioning-independent, dense, stable."""

from pyspark.sql import functions as F

from grenad_spark.corpus import assign_doc_ids, to_cc_shape


def test_doc_ids_dense_and_partitioning_independent(spark, docs_small):
    cc = to_cc_shape(docs_small).select("url", "text")
    a = assign_doc_ids(cc.repartition(3), num_buckets=16)
    b = assign_doc_ids(cc.repartition(17).sortWithinPartitions("text"), num_buckets=16)
    ma = {r["url"]: r["doc_id"] for r in a.collect()}
    mb = {r["url"]: r["doc_id"] for r in b.collect()}
    assert ma == mb  # layout-independent
    n = len(ma)
    assert sorted(ma.values()) == list(range(n))  # dense 0..N-1


def test_doc_ids_stable_across_subsets(spark, docs_small):
    # ids derive from url hash-order, so re-running on the SAME corpus gives
    # the SAME ids (run-reproducibility for resumable builds)
    cc = to_cc_shape(docs_small).select("url", "text")
    m1 = {r["url"]: r["doc_id"] for r in assign_doc_ids(cc, num_buckets=8).collect()}
    m2 = {r["url"]: r["doc_id"] for r in assign_doc_ids(cc, num_buckets=8).collect()}
    assert m1 == m2
