"""End-to-end property fuzz: random corpora through the FULL pipeline
(tokenize → shard → encode → segments → WAND) and the full compaction path,
checked against pure-Python oracles — the Spark-level complement to the
UDF-level fuzz in test_wand_property.py (grenad's qc_loop.sh spirit).

Example counts are small (each example builds real indexes); the corpora are
adversarial by construction: tiny doc spaces force head terms, re-crawled
doc overlaps, multi-shard + tiny-block layouts.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from grenad_spark.index.build import build_index
from grenad_spark.index.compact import compact_indexes
from grenad_spark.query.bm25 import REFERENCE_QUERIES
from grenad_spark.query.search import search_topk
from tests.test_search import python_bm25_oracle

VOCAB = ["spark", "merge", "sort", "dup", "key", "value", "fast", "slow"]


@st.composite
def corpus(draw):
    n_docs = draw(st.integers(8, 40))
    rows = []
    for d in range(n_docs):
        n_tok = draw(st.integers(1, 12))
        toks = [VOCAB[draw(st.integers(0, len(VOCAB) - 1))] for _ in range(n_tok)]
        rows.append((d, " ".join(toks)))
    return rows


_QUERIES = [(1, "spark merge"), (2, "dup"), (3, "slow fast key value")]


@pytest.mark.slow
@given(corpus(), st.integers(1, 4), st.sampled_from([4, 16, 128]))
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
def test_e2e_build_search_matches_python_oracle(spark, tmp_path_factory, rows, n_shards, block_size):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("fz") / "idx")
    idx = build_index(spark, docs, out, n_shards=n_shards, block_size=block_size, overwrite=True)
    want = python_bm25_oracle([{"doc_id": d, "text": t} for d, t in rows], _QUERIES, k=5)
    for mode in ("wand", "wand_pruned"):
        got = sorted(
            map(tuple, search_topk(spark, idx, _QUERIES, k=5, mode=mode).collect())
        )
        assert got == want, mode


@pytest.mark.slow
@given(corpus(), st.sets(st.integers(0, 39), max_size=10))
@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
def test_e2e_compaction_matches_python_oracle(spark, tmp_path_factory, rows, recrawled):
    """gen0 = full corpus, gen1 = re-crawled subset with changed text;
    compacted term_dict must equal a dict oracle over the logical corpus."""
    base = {d: t for d, t in rows}
    recrawl = {d: base[d] + " dup dup" for d in recrawled if d in base}
    if not recrawl:
        return
    root = tmp_path_factory.mktemp("fzc")
    g0, g1 = str(root / "g0"), str(root / "g1")
    docs0 = spark.createDataFrame(list(base.items()), "doc_id long, text string")
    docs1 = spark.createDataFrame(list(recrawl.items()), "doc_id long, text string")
    build_index(spark, docs0, g0, n_shards=2, overwrite=True)
    build_index(spark, docs1, g1, n_shards=2, overwrite=True)
    idx = compact_indexes(spark, [g0, g1], str(root / "c"))
    got = {
        r["term"]: (r["df"], r["cf"])
        for r in idx.term_dict(spark).select("term", "df", "cf").collect()
    }
    logical = {**base, **recrawl}
    want: dict[str, list[int]] = {}
    for d, t in logical.items():
        toks = t.split()
        for term in set(toks):
            df, cf = want.get(term, (0, 0))
            want[term] = (df + 1, cf + toks.count(term))
    assert got == want
