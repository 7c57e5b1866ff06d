"""PII redaction + benchmark decontamination (operators/scrub.py)."""

from pyspark.sql import functions as F

from grenad_spark.operators import scrub


def test_redact_pii_rules(spark):
    docs = spark.createDataFrame(
        [
            (0, "mail me at alice.smith+x@sub.example.org today"),
            (1, "see https://a.example/path?q=1&r=2#frag now"),
            (2, "call 12345678 or 555123456789 ok"),
            (3, "clean text with short 123 number"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["text"], r["n_redactions"]) for r in scrub.redact_pii(docs).collect()}
    assert out[0] == ("mail me at <email> today", 1)
    assert out[1] == ("see <url> now", 1)
    assert out[2] == ("call <number> or <number> ok", 2)
    assert out[3] == ("clean text with short 123 number", 0)  # <7 digits kept


def test_decontaminate_drops_shingle_sharers(spark):
    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "a completely different document about spark engines"),
            (2, "prefix words then the quick brown fox jumps too"),
            (3, "short doc"),  # < n tokens: no shingles, never contaminated
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quiz answer the quick brown fox jumps away")],
        "doc_id long, text string",
    )
    safe = {r["doc_id"] for r in scrub.decontaminate(corpus, bench, n=5).collect()}
    # docs 0 and 2 share the 5-gram "the quick brown fox jumps"
    assert safe == {1, 3}
    # the benchmark-shingle side must broadcast (tiny eval suite)
    plan = scrub.decontaminate(corpus, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_repetition_stats_hand_cases(spark):
    """Gopher repetition fractions on hand-computable docs; keep verdicts
    at the published thresholds; short docs degrade to zero fractions."""
    import duckdb
    import pandas as pd

    from grenad_spark.functions.textstats import (
        repetition_stats,
        sql_repetition_stats,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b a b a b a b"),      # 'a b' = 4/7 of bigrams
            (1, "x y z w v u t s r q"),  # all n-grams unique
            (2, "m m m m m m"),          # one token repeated
            (3, "one two"),              # below 5-gram length
            (4, "t"),                    # no n-grams at all
        ],
        "doc_id long, text string",
    )
    got = (
        repetition_stats(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got.loc[0, "top2_frac"] == round(4 / 7, 6)
    assert not got.loc[0, "keep"] and not got.loc[2, "keep"]
    assert got.loc[1, "keep"] and got.loc[4, "keep"]
    assert got.loc[4, "top2_frac"] == 0.0
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    exp = (
        con.execute(sql_repetition_stats()).fetchdf()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
