"""facetStats, capped facet distribution, and the documents endpoint —
python/pandas oracles over the sf0.001 documents table."""

import re

import pandas as pd
import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def pdf_docs():
    return pd.read_parquet(SF_SMALL + "/documents.parquet")


def test_facet_stats_matches_pandas(spark, index_small, docs_small, pdf_docs):
    from grenad_spark.functions.tokenize import TOKEN_SPLIT_RE
    from grenad_spark.operators.facets import facet_stats

    got = {
        r.facet: (r.vmin, r.vmax, r.cnt)
        for r in facet_stats(
            spark, index_small, docs_small, ["n_chars", "doc_id"], term="dup"
        ).collect()
    }
    m = pdf_docs[
        pdf_docs["text"].map(
            lambda t: "dup" in re.split(TOKEN_SPLIT_RE, t.lower())
        )
    ]
    assert len(m) > 0
    for c in ("n_chars", "doc_id"):
        assert got[c] == (float(m[c].min()), float(m[c].max()), len(m))


def test_facet_distribution_capped_orders(spark, docs_small, pdf_docs):
    from grenad_spark.operators.facets import facet_distribution_capped

    for sort_by, keyf in (
        ("count", lambda kv: (-kv[1], kv[0])),
        ("alpha", lambda kv: kv[0]),
    ):
        got = facet_distribution_capped(
            docs_small, ["lang", "source"], max_values_per_facet=3,
            sort_by=sort_by,
        ).collect()
        for facet in ("lang", "source"):
            counts = pdf_docs[facet].astype(str).value_counts().to_dict()
            exp = sorted(counts.items(), key=keyf)[:3]
            g = sorted(
                ((r.value, r.cnt) for r in got if r.facet == facet), key=keyf
            )
            assert g == exp, (sort_by, facet)
    with pytest.raises(ValueError, match="sortFacetValuesBy"):
        facet_distribution_capped(docs_small, ["lang"], sort_by="nope")


def test_fetch_documents_keyset_and_offset(spark, docs_small, pdf_docs):
    from grenad_spark.operators.documents import fetch_documents

    filt = "lang = 'en' AND n_chars >= 200"
    m = pdf_docs[(pdf_docs["lang"] == "en") & (pdf_docs["n_chars"] >= 200)]
    m = m.sort_values("doc_id")

    page1 = fetch_documents(
        docs_small, ["lang", "n_chars"], filter_expr=filt, limit=5
    ).collect()
    assert [r.doc_id for r in page1] == list(m["doc_id"][:5])
    assert [tuple(r) for r in page1] == [
        (int(r.doc_id), r.lang, int(r.n_chars))
        for r in m[["doc_id", "lang", "n_chars"]][:5].itertuples(index=False)
    ]

    # keyset page 2 == offset page 2
    after = page1[-1].doc_id
    p2_keyset = fetch_documents(
        docs_small, ["lang", "n_chars"], filter_expr=filt, after=after, limit=5
    ).collect()
    p2_offset = fetch_documents(
        docs_small, ["lang", "n_chars"], filter_expr=filt, offset=5, limit=5
    ).collect()
    assert [tuple(r) for r in p2_keyset] == [tuple(r) for r in p2_offset]
    assert [r.doc_id for r in p2_keyset] == list(m["doc_id"][5:10])

    with pytest.raises(ValueError, match="not both"):
        fetch_documents(docs_small, ["lang"], after=1, offset=1)


def test_placeholder_page_bruteforce(spark, docs_small):
    """Placeholder search (empty q): filter + multi-key sort + exhaustive
    pagination equal the brute-force slice; the plan is a distributed
    top-(offset+limit) with the filter pushed, never a global sort."""
    from grenad_spark.query.filter_expr import parse_filter
    from grenad_spark.query.search import placeholder_page

    fsql = parse_filter("n_chars >= 150")
    sort = [("n_chars", False), ("lang", True)]
    out = placeholder_page(spark, docs_small, fsql, sort, offset=10, limit=7)
    rows = [(r.doc_id, r.rank, r.total_hits) for r in out.collect()]
    pdf = docs_small.select("doc_id", "n_chars", "lang").toPandas()
    cand = pdf[pdf.n_chars >= 150].sort_values(
        ["n_chars", "lang", "doc_id"], ascending=[False, True, True]
    ).reset_index(drop=True)
    exp = [
        (int(cand.doc_id[i]), i + 1, len(cand))
        for i in range(10, min(17, len(cand)))
    ]
    assert sorted(rows) == sorted(exp)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
