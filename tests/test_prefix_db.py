"""Materialized prefix postings (index/prefix.py) — the word_prefix_docids
build stage: selection threshold, manifest lineage, resume, and the
materialized-vs-fallback serving equivalence."""

import json
import os

import pytest
from pyspark.sql import functions as F

from grenad_spark.index.prefix import (
    build_prefix_postings,
    search_topk_prefix_db,
)


@pytest.fixture(scope="module")
def pidx(spark, docs_small, index_small):
    """index_small with prefix postings built at the defaults."""
    if not index_small.has_prefix_postings():
        build_prefix_postings(spark, docs_small, index_small.path)
    return index_small


def test_build_writes_tables_and_manifest(spark, pidx):
    assert pidx.has_prefix_postings()
    with open(os.path.join(pidx.path, "manifest.json")) as fh:
        m = json.load(fh)
    assert m["prefix_postings"] == {"max_len": 2, "min_terms": 2}
    assert "prefix_postings" in m["stage_seconds"]
    pd_ = pidx.prefix_dict(spark)
    rows = {r["prefix"]: r for r in pd_.collect()}
    assert rows and all(1 <= len(p) <= 2 for p in rows)


def test_prefix_df_equals_merged_doc_count(spark, docs_small, pidx):
    """prefix_dict.df == docs containing ANY word with the prefix (the
    encoder merged duplicate (prefix, doc) rows across source words)."""
    from grenad_spark.functions.tokenize import tokens_col

    got = {r["prefix"]: r["df"] for r in pidx.prefix_dict(spark).collect()}
    toks = docs_small.select(
        "doc_id", F.explode(tokens_col("text")).alias("term")
    ).distinct()
    for p in ("d", "sp", "me"):
        if p not in got:
            continue
        expect = (
            toks.filter(F.col("term").startswith(p))
            .select("doc_id").distinct().count()
        )
        assert got[p] == expect, p


def test_materialized_equals_fallback(spark, docs_small, pidx, tmp_path):
    """A build whose threshold materializes NOTHING must serve the exact
    same page through the expansion fallback."""
    from grenad_spark.index.build import build_index

    out = str(tmp_path / "idx_nofallback")
    idx2 = build_index(spark, docs_small, out, n_shards=3)
    build_prefix_postings(
        spark, docs_small, idx2.path, min_terms=10_000_000
    )
    assert idx2.prefix_dict(spark).count() == 0
    queries = [(1, "sp"), (2, "d"), (3, "dup")]
    a = sorted(
        map(tuple, search_topk_prefix_db(spark, pidx, queries, k=10)
            .toPandas().values.tolist())
    )
    b = sorted(
        map(tuple, search_topk_prefix_db(spark, idx2, queries, k=10)
            .toPandas().values.tolist())
    )
    assert a and a == b


def test_resume_is_noop_and_repairs_manifest(spark, docs_small, pidx):
    """Second build call returns early (data _SUCCESS-complete) and restores
    the manifest stanza if a crash wiped it."""
    mpath = os.path.join(pidx.path, "manifest.json")
    with open(mpath) as fh:
        m = json.load(fh)
    m.pop("prefix_postings")
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    build_prefix_postings(spark, docs_small, pidx.path)
    with open(mpath) as fh:
        m2 = json.load(fh)
    assert m2["prefix_postings"] == {"max_len": 2, "min_terms": 2}
