"""Positional index + phrase search tests.

- encode/decode round-trip of position blocks (Hypothesis, the
  qc_codec-style identity of the positions layer).
- search_topk_phrase vs a Python brute-force adjacency oracle on a random
  word-salad corpus, including multi-block indexes (tiny block_size),
  repeated-term phrases, and OOV phrases.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from grenad_spark.index.positions import (
    MAX_POS,
    decode_position_blocks,
    encode_position_blocks,
)


@st.composite
def positional_postings(draw):
    n = draw(st.integers(min_value=1, max_value=120))
    docs = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=10**11),
                min_size=n, max_size=n, unique=True,
            )
        )
    )
    tfs, positions = [], []
    for _ in range(n):
        tf = draw(st.integers(1, 12))
        pos = sorted(
            draw(
                st.lists(
                    st.integers(0, 5000), min_size=tf, max_size=tf, unique=True
                )
            )
        )
        tfs.append(tf)
        positions.extend(pos)
    dls = draw(st.lists(st.integers(1, 6000), min_size=n, max_size=n))
    return (
        np.array(docs, dtype=np.int64),
        np.array(tfs, dtype=np.int64),
        np.array(dls, dtype=np.int64),
        np.array(positions, dtype=np.int64),
    )


@given(positional_postings(), st.integers(min_value=1, max_value=64))
@settings(max_examples=60, deadline=None)
def test_position_blocks_roundtrip(p, block_size):
    docs, tfs, dls, positions = p
    blocks = encode_position_blocks(docs, tfs, dls, positions, block_size)
    assert sum(b[0] for b in blocks) == docs.size
    d2, tf2, dl2, pos2, occ2 = decode_position_blocks(
        [b[3] for b in blocks], [b[4] for b in blocks],
        np.array([b[0] for b in blocks]),
    )
    assert np.array_equal(d2, docs)
    assert np.array_equal(tf2, tfs)
    assert np.array_equal(dl2, dls)
    assert np.array_equal(pos2, positions)
    assert np.array_equal(occ2, np.concatenate(([0], np.cumsum(tfs)[:-1])))


def test_position_overflow_rejected():
    with pytest.raises(ValueError):
        encode_position_blocks(
            np.array([1]), np.array([1]), np.array([1]),
            np.array([MAX_POS + 1]),
        )


# ---------------------------------------------------------------------------
# end-to-end phrase search vs brute-force adjacency oracle
# ---------------------------------------------------------------------------

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _mk_corpus(rng, n_docs):
    rows = []
    for i in range(n_docs):
        dl = rng.integers(3, 30)
        rows.append((i, " ".join(rng.choice(VOCAB) for _ in range(dl))))
    return rows


def _brute_phrase_match(rows, phrase_toks):
    out = []
    m = len(phrase_toks)
    for doc_id, text in rows:
        toks = text.split()
        if any(
            toks[i : i + m] == phrase_toks for i in range(len(toks) - m + 1)
        ):
            out.append(doc_id)
    return set(out)


@pytest.fixture(scope="module")
def phrase_index(spark, tmp_path_factory):
    from grenad_spark.index.build import build_index
    from grenad_spark.index.positions import build_positions

    rng = np.random.default_rng(7)
    rows = _mk_corpus(rng, 400)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("pidx") / "index")
    # tiny block_size forces multi-block terms through the positions decoder
    idx = build_index(spark, docs, out, n_shards=3, block_size=16)
    build_positions(spark, docs, out, block_size=16)
    return idx, rows


PHRASES = [
    (1, "alpha beta"),
    (2, "gamma delta eps"),
    (3, "beta beta"),        # repeated term
    (4, "zeta"),             # single-term phrase
    (5, "alpha nosuchword"), # OOV => empty
]


def test_phrase_matches_bruteforce(spark, phrase_index):
    from grenad_spark.query.phrase import search_topk_phrase

    idx, rows = phrase_index
    got = search_topk_phrase(spark, idx, PHRASES, k=10**6).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.doc_id)
    for qid, phrase in PHRASES:
        expect = _brute_phrase_match(rows, phrase.split())
        assert by_q.get(qid, set()) == expect, (qid, phrase)


def test_phrase_scores_match_and_path(spark, phrase_index):
    """A single-term 'phrase' must score exactly like the conjunctive path
    for that term (same BM25 over the same match set)."""
    from grenad_spark.query.phrase import search_topk_phrase
    from grenad_spark.query.search import search_conjunctive

    idx, _rows = phrase_index
    p = search_topk_phrase(spark, idx, [(1, "zeta")], k=10).collect()
    a = search_conjunctive(spark, idx, [(1, "zeta")], k=10).collect()
    assert sorted((r.doc_id, r.score) for r in p) == sorted(
        (r.doc_id, r.score) for r in a
    )


def test_phrase_requires_positions(spark, index_small):
    from grenad_spark.query.phrase import search_topk_phrase

    if index_small.has_positions():
        pytest.skip("shared fixture already has positions")
    with pytest.raises(FileNotFoundError):
        search_topk_phrase(spark, index_small, [(1, "the fast")], k=5).collect()
