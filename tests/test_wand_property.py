"""Property-based rank-identity: batched block-max pruning and cursor WAND
must equal the exhaustive scorer on ARBITRARY posting sets (Hypothesis),
exercising multi-block lists, θ ties, gaps, singleton terms — the
qc-style replacement for grenad's quickcheck seeks (SURVEY §5).

Runs the pandas UDF functions directly (no Spark session) — the functions
are pure, so this covers the scoring/skipping logic at fuzz speed.
"""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from grenad_spark.functions.varbyte import encode_posting_blocks
from grenad_spark.query.search import _make_exhaustive, _make_wand, _make_wand_batched


@st.composite
def query_group(draw):
    """One (query, shard) group: 1-4 terms, each with a random posting list
    over a small doc space (forcing collisions and ties)."""
    n_terms = draw(st.integers(1, 4))
    doc_space = draw(st.integers(5, 400))
    avgdl = float(draw(st.integers(5, 80)))
    # small block sizes force MANY blocks per list: exercises the multi-block
    # θ seed (rare terms with fewer than k docs per block), range-boundary
    # pruning, and the dense/sparse extraction branches
    block_size = draw(st.sampled_from([4, 16, 128]))
    rows = []
    for ti in range(n_terms):
        n_docs = draw(st.integers(1, min(doc_space, 150)))
        docs = sorted(draw(st.sets(st.integers(0, doc_space - 1), min_size=n_docs, max_size=n_docs)))
        docs = np.array(docs, dtype=np.int64)
        # constant-ish tf/dl pools force exact score ties
        tfs = np.array([draw(st.sampled_from([1, 1, 2, 5]))for _ in docs], dtype=np.int64)
        dls = np.array([draw(st.sampled_from([10, 10, 40]))for _ in docs], dtype=np.int64)
        idf = float(draw(st.floats(0.05, 3.0, allow_nan=False)))
        for bid, (n, first, last, max_tf, min_dl, min_tf, max_dl, sum_tf, payload) in enumerate(
            encode_posting_blocks(docs, tfs, dls, block_size)
        ):
            rows.append(
                {
                    "query_id": 1,
                    "shard": 0,
                    "block_id": bid,
                    "term": f"t{ti}",
                    "idf": idf,
                    "n": n,
                    "first_doc": first,
                    "last_doc": last,
                    "max_tf": max_tf,
                    "min_dl": min_dl,
                    "min_tf": min_tf,
                    "max_dl": max_dl,
                    "payload": payload,
                }
            )
    return pd.DataFrame(rows), avgdl


def _norm(df):
    return sorted(map(tuple, df[["query_id", "doc_id", "score"]].values.tolist()))


@given(query_group(), st.integers(1, 15))
@settings(max_examples=200, deadline=None)
def test_wand_modes_equal_exhaustive(qg, k):
    pdf, avgdl = qg
    ex = _norm(_make_exhaustive(avgdl, k)(pdf.copy()))
    # default: small fuzz lists all take the sparse pseudo-block path;
    # sparse_postings_max=0 forces the block-granular (dense) path — both
    # must stay rank-identical to exhaustive
    wb = _norm(_make_wand_batched(avgdl, k)(pdf.copy()))
    wd = _norm(_make_wand_batched(avgdl, k, sparse_postings_max=0)(pdf.copy()))
    wc = _norm(_make_wand(avgdl, k)(pdf.copy()))
    # scores are floats computed along different code paths -> compare with
    # rounding (the engine rounds to 4 decimals before ranking anyway)
    def r(rows):
        return [(q, d, round(s, 9)) for q, d, s in rows]

    assert r(wb) == r(ex)
    assert r(wd) == r(ex)
    assert r(wc) == r(ex)


@given(query_group(), st.integers(1, 15), st.integers(0, 15))
@settings(max_examples=200, deadline=None)
def test_metadata_prune_preserves_topk(qg, k, dense_bits):
    """The pass-1 pruner must never drop a block the exact top-k depends on:
    scoring only its surviving blocks with the batched WAND must equal the
    exhaustive scorer over ALL blocks — on arbitrary posting sets, including
    θ ties at block boundaries, and for every dense/sparse term split
    (dense terms are metadata-only: payload withheld from the pruner;
    sparse terms carry payloads and prune at exact posting positions)."""
    from grenad_spark.query.search import _make_meta_prune

    pdf, avgdl = qg
    meta = pdf.copy()
    # term ti is DENSE iff bit i of dense_bits is set — fuzz all splits
    meta["payload"] = [
        None if (dense_bits >> int(t[1:])) & 1 else p
        for t, p in zip(meta["term"], meta["payload"])
    ]
    surv = _make_meta_prune(avgdl, k)(meta)
    keep = pdf.merge(surv, on=["query_id", "term", "shard", "block_id"])
    ex = _norm(_make_exhaustive(avgdl, k)(pdf.copy()))
    pruned = _norm(_make_wand_batched(avgdl, k)(keep))

    def r(rows):
        return [(q, d, round(s, 9)) for q, d, s in rows]

    assert r(pruned) == r(ex)
