"""Negative keywords (-word) and matchingStrategy=last — query-language
features over the standard index, each checked against a pandas brute-force
oracle recomputed from the raw corpus (the registered contract queries hold
the DuckDB-SQL side; these hold the semantics at module level)."""

import math
import re

import pytest

from grenad_spark.functions.tokenize import TOKEN_SPLIT_RE
from grenad_spark.query.bm25 import B, K1, SCORE_DECIMALS
from grenad_spark.query.search import (
    parse_negative_query,
    search_topk,
    search_topk_matching_frequency,
    search_topk_matching_last,
    search_topk_negative,
)


def _corpus_tokens(docs_small):
    rows = docs_small.select("doc_id", "text").collect()
    return {
        r.doc_id: [t for t in re.split(TOKEN_SPLIT_RE, r.text.lower()) if t]
        for r in rows
    }


def _bm25_parts(toks):
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for v in toks.values():
        for w in set(v):
            df[w] = df.get(w, 0) + 1
    return n, avgdl, df


def _score(toks, avgdl, n, df, doc, terms):
    s = 0.0
    for t in terms:
        tf = toks[doc].count(t)
        if tf == 0 or t not in df:
            continue
        idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
        s += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(toks[doc]) / avgdl))
    return round(s, SCORE_DECIMALS)


def test_parse_negative_query():
    assert parse_negative_query("spark -slow") == (["spark"], ["slow"])
    assert parse_negative_query("-Slow! fast") == (["fast"], ["slow"])
    assert parse_negative_query("a -b -c d") == (["a", "d"], ["b", "c"])
    assert parse_negative_query("-only") == ([], ["only"])


def test_negative_excludes_and_refills(spark, docs_small, index_small):
    """Every excluded doc is absent, every returned doc is clean of the
    negative terms, and ranking equals the brute-force oracle (exclusion
    applied BEFORE top-k, so next-best docs refill the page)."""
    toks = _corpus_tokens(docs_small)
    n, avgdl, df = _bm25_parts(toks)
    queries = [(1, "spark -slow"), (2, "merge sort -dup"), (3, "-dup")]
    out = search_topk_negative(spark, index_small, queries, k=10)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append((r.doc_id, r.score))
    assert 3 not in got  # only-negative query matches nothing
    for qid, q in queries[:2]:
        pos, neg = parse_negative_query(q)
        cand = [
            d for d in toks
            if any(t in toks[d] for t in pos) and not any(t in toks[d] for t in neg)
        ]
        expect = sorted(
            ((d, _score(toks, avgdl, n, df, d, pos)) for d in cand),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        assert got.get(qid, []) == expect, qid
        for d, _ in got.get(qid, []):
            assert not any(t in toks[d] for t in neg)


def test_negative_without_negatives_equals_plain_search(
    spark, docs_small, index_small
):
    a = sorted(
        map(tuple, search_topk_negative(
            spark, index_small, [(7, "dup spark")], k=10
        ).toPandas().values.tolist())
    )
    b = sorted(
        map(tuple, search_topk(
            spark, index_small, [(7, "dup spark")], k=10, mode="exhaustive"
        ).toPandas().values.tolist())
    )
    assert a == b


def test_matching_last_prefix_semantics(spark, docs_small, index_small):
    """matched_prefix = longest gap-free run of query words from word 0; a
    doc matching words {0, 2} but not 1 sits in the prefix-1 bucket; docs
    missing word 0 never match."""
    toks = _corpus_tokens(docs_small)
    n, avgdl, df = _bm25_parts(toks)
    queries = [(1, "merge sort table"), (2, "dup zzzmissing stream")]
    out = search_topk_matching_last(spark, index_small, queries, k=10)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append((r.doc_id, r.matched_prefix, r.score))
    for qid, q in queries:
        words = q.split()
        expect = []
        for d in toks:
            matched = [w for w in words if w in toks[d]]
            if not matched:
                continue
            lp = 0
            for w in words:
                if w not in toks[d]:
                    break
                lp += 1
            if lp == 0:
                continue
            expect.append((d, lp, _score(toks, avgdl, n, df, d, set(matched))))
        expect.sort(key=lambda x: (-x[1], -x[2], x[0]))
        assert got.get(qid, []) == expect[:10], qid
    # the OOV gap query must cap every prefix at 1 despite stream matches
    assert got[2] and all(lp == 1 for _, lp, _ in got[2])
    assert any("stream" in toks[d] for d, _, _ in got[2])


def test_matching_frequency_rarity_order(spark, docs_small, index_small):
    """matchingStrategy=frequency buckets by the longest covered leading run
    of the (df ASC, term ASC) rarity ordering — the most frequent word is
    the first dropped, so a doc missing ONLY the most frequent word sits one
    bucket below a full match, regardless of query word order."""
    toks = _corpus_tokens(docs_small)
    n, avgdl, df = _bm25_parts(toks)
    queries = [(1, "the merge sort"), (2, "merge sort table")]
    out = search_topk_matching_frequency(spark, index_small, queries, k=10)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append((r.doc_id, r.matched_prefix, r.score))
    for qid, q in queries:
        words = sorted(set(q.split()), key=lambda t: (df.get(t, 0), t))
        expect = []
        for d in toks:
            matched = [w for w in words if w in toks[d]]
            if not matched:
                continue
            lp = 0
            for w in words:
                if w not in toks[d]:
                    break
                lp += 1
            if lp == 0:
                continue
            expect.append((d, lp, _score(toks, avgdl, n, df, d, set(matched))))
        expect.sort(key=lambda x: (-x[1], -x[2], x[0]))
        assert got.get(qid, []) == expect[:10], qid


def test_matching_frequency_oov_never_dropped(spark, docs_small, index_small):
    """An OOV term has df 0 → rarest → slot 0 → never covered: the query
    returns no rows (Meilisearch's frequency dropping never removes it)."""
    out = search_topk_matching_frequency(
        spark, index_small, [(1, "zzzmissing merge sort")], k=10
    )
    assert out.count() == 0


def test_matching_last_repeated_word(spark, docs_small, index_small):
    """A repeated query word covers BOTH its slots (term→slot map is 1:n);
    the score counts the term once."""
    toks = _corpus_tokens(docs_small)
    n, avgdl, df = _bm25_parts(toks)
    out = search_topk_matching_last(spark, index_small, [(1, "dup dup")], k=5)
    rows = [(r.doc_id, r.matched_prefix, r.score) for r in out.collect()]
    assert rows, "dup matches docs"
    for d, lp, s in rows:
        assert lp == 2  # both slots covered by the one term
        assert s == _score(toks, avgdl, n, df, d, {"dup"})


def test_highlight_wraps_exactly_matched_tokens(spark, docs_small, index_small):
    """_formatted wraps every token equal to a query term (and nothing
    else) in the pre/post tags, over the normalized token stream."""
    from grenad_spark.query.search import search_topk_highlight

    toks = _corpus_tokens(docs_small)
    out = search_topk_highlight(
        spark, index_small, docs_small, [(1, "Merge SORT")], k=5,
        pre_tag="<em>", post_tag="</em>",
    ).collect()
    assert out, "query matches docs"
    for r in out:
        expect = " ".join(
            f"<em>{t}</em>" if t in ("merge", "sort") else t
            for t in toks[r.doc_id]
        )
        assert r.formatted == expect
        assert "<em>" in r.formatted  # a returned doc matched something


def test_negative_phrase_excludes_adjacent_only(spark, docs_small, index_small):
    """-"a b" excludes exactly the docs where a and b are ADJACENT in
    order; docs containing both words apart survive. Word and phrase
    exclusions compose; an OOV phrase excludes nothing; ranking equals the
    brute-force oracle on the surviving set."""
    from grenad_spark.index.positions import build_positions
    from grenad_spark.query.search import (
        parse_negative_phrases,
        parse_negative_query,
        search_topk_negative_phrases,
    )

    if not index_small.has_positions():
        build_positions(
            spark, docs_small.select("doc_id", "text"), index_small.path
        )
    toks = _corpus_tokens(docs_small)
    n, avgdl, df = _bm25_parts(toks)
    queries = [
        (1, 'spark -"merge sort"'),
        (2, 'data -"the fast" -batch'),
        (3, 'join -"zzz missing"'),
        (4, '-"merge sort"'),
    ]
    out = search_topk_negative_phrases(spark, index_small, queries, k=10)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append((r.doc_id, r.score))
    assert 4 not in got  # only-negative query matches nothing

    def has_phrase(ts, ph):
        pt = ph.lower().split()
        return any(ts[i:i + len(pt)] == pt for i in range(len(ts)))

    saw_phrase_excluded = False
    for qid, q in queries[:3]:
        rest, phrases = parse_negative_phrases(q)
        pos, neg = parse_negative_query(rest)
        cand = []
        for d, ts in toks.items():
            if not any(t in ts for t in pos):
                continue
            if any(t in ts for t in neg):
                continue
            if any(has_phrase(ts, p) for p in phrases):
                saw_phrase_excluded = True
                # non-adjacent co-occurrence must SURVIVE — checked below
                continue
            cand.append(d)
        expect = sorted(
            ((d, _score(toks, avgdl, n, df, d, pos)) for d in cand),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        assert got.get(qid, []) == expect, qid
    assert saw_phrase_excluded
    # non-vacuity of adjacency: some returned doc for q1 contains both
    # 'merge' and 'sort' NON-adjacently (a bag-of-words exclusion would
    # have dropped it)
    survivors = [d for d, _ in got[1]]
    assert any(
        "merge" in toks[d] and "sort" in toks[d]
        and not has_phrase(toks[d], "merge sort")
        for d in survivors
    )
