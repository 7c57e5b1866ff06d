"""showMatchesPosition (query/matches.py): positions served from the index
must equal brute-force re-tokenization of the hit documents."""

import re

import pytest


@pytest.fixture(scope="module")
def pos_index(spark, docs_small, index_small):
    from grenad_spark.index.positions import build_positions

    if not index_small.has_positions():
        build_positions(spark, docs_small, index_small.path)
    return index_small


def test_matches_positions_bruteforce(spark, docs_small, pos_index):
    from grenad_spark.query.matches import search_topk_matches
    from grenad_spark.query.search import search_topk

    queries = [(1, "merge sort"), (2, "the fast"), (3, "zzznope")]
    k = 7
    top = search_topk(spark, pos_index, queries, k=k, mode="exhaustive").collect()
    hits = {}
    for r in top:
        hits.setdefault(r.query_id, {})[r.doc_id] = r.score
    texts = {r.doc_id: r.text for r in docs_small.collect()}
    got = {}
    rows = search_topk_matches(spark, pos_index, queries, k=k).collect()
    for r in rows:
        got.setdefault((r.query_id, r.doc_id, r.term), []).append((r.pos, r.score))
    # exactly the expected occurrence set, no extras
    expect = {}
    for qid, q in queries:
        terms = {t for t in re.split(r"[^a-z0-9]+", q.lower()) if t}
        for d, score in hits.get(qid, {}).items():
            toks = [t for t in re.split(r"[^a-z0-9]+", texts[d].lower()) if t]
            for t in terms:
                ps = [i for i, w in enumerate(toks) if w == t]
                if ps:
                    expect[(qid, d, t)] = sorted((p, score) for p in ps)
    assert {k2: sorted(v) for k2, v in got.items()} == expect


def test_matches_empty_for_oov(spark, pos_index):
    from grenad_spark.query.matches import search_topk_matches

    out = search_topk_matches(spark, pos_index, [(9, "zzznope qqqq")], k=5)
    assert out.count() == 0
