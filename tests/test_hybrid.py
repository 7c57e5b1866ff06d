"""Hybrid keyword⊕vector search + federated multi-index search
(query/hybrid.py) against brute-force python oracles."""

import math

import numpy as np
import pytest

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
DIM = 8


def _mk(rng, n_docs):
    docs = []
    embs = []
    for i in range(n_docs):
        toks = [str(rng.choice(VOCAB)) for _ in range(int(rng.integers(3, 20)))]
        docs.append((i, " ".join(toks), "en" if i % 3 else "fr"))
        embs.append((i, [float(x) for x in rng.normal(size=DIM)]))
    return docs, embs


@pytest.fixture(scope="module")
def hybrid_fixture(spark, tmp_path_factory):
    from grenad_spark.index.build import build_index

    rng = np.random.default_rng(47)
    docs, embs = _mk(rng, 200)
    ddf = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    edf = spark.createDataFrame(
        embs, "vec_id long, embedding array<float>"
    )
    out = str(tmp_path_factory.mktemp("hyb") / "index")
    idx = build_index(spark, ddf.select("doc_id", "text"), out, n_shards=3,
                      block_size=16)
    return idx, ddf, edf, docs, embs


def _bm25_all(docs, terms):
    toks = {d: t.split() for d, t, _ in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for v in toks.values():
        for w in set(v):
            df[w] = df.get(w, 0) + 1
    out = {}
    for d, tl in toks.items():
        s = 0.0
        for w in set(terms):
            tf = tl.count(w)
            if tf == 0 or w not in df:
                continue
            idf = math.log(1 + (n - df[w] + 0.5) / (df[w] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(tl) / avgdl))
        if s > 0:
            out[d] = round(s, 4)
    return out


def _r6(x: float) -> float:
    # Spark's F.round is decimal HALF_UP (BigDecimal over Double.toString),
    # python round() is banker's — the two differ at exact .5 boundaries,
    # which (cos+1)/2 hits systematically (7th digit is 0 or 5)
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _cos(a, b):
    # float32 ingestion then double math — mirror the engine's cast chain
    a = np.asarray(a, dtype=np.float32).astype(np.float64)
    b = np.asarray(b, dtype=np.float32).astype(np.float64)
    return _r6(float(a @ b / (math.sqrt(a @ a) * math.sqrt(b @ b))))


def test_hybrid_bruteforce(spark, hybrid_fixture):
    from grenad_spark.query.hybrid import hybrid_topk

    idx, ddf, edf, docs, embs = hybrid_fixture
    queries = [(1, "alpha beta", 7), (2, "zeta", 11), (3, "qqqq zzzz", 3)]
    k, ratio = 8, 0.5
    got = {}
    for r in hybrid_topk(spark, idx, edf, queries, ratio=ratio, k=k).collect():
        got.setdefault(r.query_id, []).append((r.doc_id, r.score))
    evec = dict(embs)
    for qid, q, vid in queries:
        kw = _bm25_all(docs, q.split())
        mx = max(kw.values()) if kw else None
        cos = {d: _cos(evec[vid], v) for d, v in evec.items()}
        sem_top = sorted(cos.items(), key=lambda x: (-x[1], x[0]))[:k]
        cand = set(kw) | {d for d, _ in sem_top}
        scored = []
        for d in cand:
            kn = kw.get(d, 0.0) / mx if (mx and d in kw) else 0.0
            sn = (cos[d] + 1) / 2 if d in cos else 0.0
            scored.append((d, _r6((1 - ratio) * kn + ratio * sn)))
        scored.sort(key=lambda x: (-x[1], x[0]))
        assert got.get(qid, []) == scored[:k], f"query {qid}"


def test_hybrid_ratio_extremes(spark, hybrid_fixture):
    """ratio=0 reduces to keyword-normalized order over keyword matches
    (semantic candidates score 0 there); ratio=1 to pure cosine order."""
    from grenad_spark.query.hybrid import hybrid_topk

    idx, ddf, edf, docs, embs = hybrid_fixture
    queries = [(1, "alpha", 5)]
    sem = hybrid_topk(spark, idx, edf, queries, ratio=1.0, k=5).collect()
    evec = dict(embs)
    cos = {d: _cos(evec[5], v) for d, v in evec.items()}
    exp = sorted(cos.items(), key=lambda x: (-x[1], x[0]))[:5]
    assert [(r.doc_id, r.score) for r in sem] == [
        (d, _r6((c + 1) / 2)) for d, c in exp
    ]
    kw_only = hybrid_topk(spark, idx, edf, queries, ratio=0.0, k=5).collect()
    kw = _bm25_all(docs, ["alpha"])
    mx = max(kw.values())
    exp_kw = sorted(((d, _r6(s / mx)) for d, s in kw.items()),
                    key=lambda x: (-x[1], x[0]))[:5]
    assert [(r.doc_id, r.score) for r in kw_only] == exp_kw


def test_federated_bruteforce(spark, hybrid_fixture, tmp_path_factory):
    from grenad_spark.index.build import build_index
    from grenad_spark.query.hybrid import federated_topk
    from pyspark.sql import functions as F

    idx, ddf, edf, docs, embs = hybrid_fixture
    base = tmp_path_factory.mktemp("fed")
    idxs = []
    for name, pred in (("en", True), ("fr", False)):
        flt = ddf.filter(
            (F.col("lang") == "en") if pred else (F.col("lang") != "en")
        )
        idxs.append(
            (name, build_index(spark, flt.select("doc_id", "text"),
                               str(base / name), n_shards=2, block_size=16))
        )
    queries = [(1, "alpha gamma"), (2, "theta")]
    got = {}
    for r in federated_topk(spark, idxs, queries, k=6).collect():
        got.setdefault(r.query_id, []).append((r.doc_id, r.index_name, r.score))
    for qid, q in queries:
        exp = []
        for name, pred in (("en", True), ("fr", False)):
            sub = [d for d in docs if (d[2] == "en") == pred]
            for d, s in _bm25_all(sub, q.split()).items():
                exp.append((d, name, s))
        exp.sort(key=lambda x: (-x[2], x[0]))
        assert got.get(qid, []) == exp[:6], f"query {qid}"
