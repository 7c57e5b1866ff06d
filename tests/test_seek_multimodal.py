"""Seek-operator ports of grenad's cursor tests (bisect oracle) + multimodal
plumbing tests."""

import bisect

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from grenad_spark.operators import multimodal, seek


# ---------------------------------------------------------------------------
# advance_key unit cases (src/reader/prefix_iter.rs:189-195)
# ---------------------------------------------------------------------------

def test_advance_key_cases():
    assert seek.advance_key(b"abc") == b"abd"
    assert seek.advance_key(b"ab\xff") == b"ac"
    assert seek.advance_key(b"\xff\xff") is None
    assert seek.advance_key(b"\x00") == b"\x01"
    assert seek.advance_str("sp") == "sq"


@given(st.binary(min_size=1, max_size=8), st.binary(min_size=0, max_size=10))
@settings(max_examples=200, deadline=None)
def test_advance_key_is_successor(prefix, suffix):
    succ = seek.advance_key(prefix)
    if succ is None:
        return
    assert prefix < succ
    assert prefix + suffix < succ  # everything with the prefix sorts below


# ---------------------------------------------------------------------------
# seek gte/lte vs bisect oracle (port of kv_monotonic,
# src/reader/reader_cursor.rs:513-589 / qc_compare_to_binary_search :673-718)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def kv_monotonic(spark):
    keys = list(range(10, 24000, 3))
    df = spark.createDataFrame([(k, k) for k in keys], "key long, value long")
    return df.repartitionByRange(4, "key").sortWithinPartitions("key").cache(), keys


def test_seek_vs_bisect_oracle(spark, kv_monotonic):
    df, keys = kv_monotonic
    rng = np.random.default_rng(42)
    for q in rng.integers(0, 24020, size=40):
        q = int(q)
        got_gte = seek.seek_gte(df, "key", q).collect()
        i = bisect.bisect_left(keys, q)
        if i < len(keys):
            assert got_gte[0]["key"] == keys[i], q
        else:
            assert got_gte == []
        got_lte = seek.seek_lte(df, "key", q).collect()
        j = bisect.bisect_right(keys, q) - 1
        if j >= 0:
            assert got_lte[0]["key"] == keys[j], q
        else:
            assert got_lte == []


def test_range_iter_vs_oracle(spark, kv_monotonic):
    df, keys = kv_monotonic
    rng = np.random.default_rng(7)
    for _ in range(10):
        a, b = sorted(int(x) for x in rng.integers(0, 24020, size=2))
        got = [r["key"] for r in seek.range_iter(df, "key", a, b, True, True).collect()]
        want = [k for k in keys if a <= k <= b]
        assert got == want
        got_rev = [r["key"] for r in seek.range_iter(df, "key", a, b, True, False, reverse=True).collect()]
        want_rev = [k for k in reversed(keys) if a <= k < b]
        assert got_rev == want_rev


def test_prefix_iter_fwd_rev(spark):
    rows = [(w, 1) for w in ["span", "spark", "sparse", "spat", "zoo", "ant"]]
    df = spark.createDataFrame(rows, "key string, value int")
    fwd = [r["key"] for r in seek.prefix_iter(df, "key", "spa").collect()]
    assert fwd == ["span", "spark", "sparse", "spat"]
    rev = [r["key"] for r in seek.prefix_iter(df, "key", "spa", reverse=True).collect()]
    assert rev == list(reversed(fwd))


def test_prefix_0xff_boundary(spark):
    # port of the 0xFF-boundary cases (src/reader/prefix_iter.rs:137-186)
    rows = [
        (bytes([0, 0, 0, 254]), b"a"),
        (bytes([0, 0, 0, 255]), b"b"),
        (bytes([0, 0, 0, 255, 1]), b"c"),
        (bytes([0, 0, 1, 0]), b"d"),
    ]
    df = spark.createDataFrame(rows, "key binary, value binary")
    succ = seek.advance_key(bytes([0, 0, 0, 255]))
    assert succ == bytes([0, 0, 1])
    from pyspark.sql import functions as F

    got = sorted(
        r["key"]
        for r in df.filter(
            (F.col("key") >= bytes([0, 0, 0, 255])) & (F.col("key") < succ)
        ).collect()
    )
    assert got == [bytes([0, 0, 0, 255]), bytes([0, 0, 0, 255, 1])]


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def media(spark, docs_small):
    return multimodal.synthesize_media(docs_small).cache()


def test_media_schema_and_determinism(media):
    assert dict(media.dtypes)["payload"] == "binary"
    a = {r["doc_id"]: r["payload"] for r in media.collect()}
    b = {r["doc_id"]: r["payload"] for r in media.collect()}
    assert a == b
    assert all(len(v) == 96 for v in a.values())  # 3 × md5 hex


def test_feature_extraction_shape(media):
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == media.count()
    for r in feats[:10]:
        v = r["features"]
        assert len(v) == multimodal.N_FEATURES
        assert abs(sum(v) - 1.0) < 1e-9


def test_resize_plumbing(media):
    out = multimodal.resize_images(media, 8, 4).collect()
    n_images = media.filter("media_type = 'image'").count()
    assert len(out) == n_images
    assert all(r["width"] == 8 and r["height"] == 4 and len(r["payload"]) == 32 for r in out)


def test_frame_sampling(media):
    frames = multimodal.sample_frames(media, every_n=2)
    rows = frames.collect()
    n_videos = media.filter("media_type = 'video'").count()
    # 96-byte payload / 64-byte frames = 1 full frame; every 2nd → 1 per video
    assert len(rows) == n_videos
    assert all(r["frame_idx"] == 0 and len(r["frame"]) == multimodal.FRAME_BYTES for r in rows)


def test_metadata_plan_prunes_payload(spark, docs_small):
    # filter() perturbs the lineage so Spark's cache manager does NOT swap in
    # the cached `media` fixture's InMemoryRelation (which carries payload)
    fresh = multimodal.synthesize_media(docs_small.filter("doc_id >= 0"))
    meta_only = fresh.groupBy("media_type").count()
    plan = meta_only._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan


def test_seek_gte_postings_vs_oracle(spark, docs_small, index_small):
    """Batched posting-level gte-seek (benches/index-levels.rs analog) must
    equal the direct term_doc_tf lookup for every key."""
    from grenad_spark.functions.tokenize import term_doc_tf
    from grenad_spark.operators.seek import seek_gte_postings

    tdt = term_doc_tf(docs_small).toPandas()
    terms = sorted(tdt["term"].unique())
    max_doc = int(tdt["doc_id"].max())
    keys = [(i, terms[i % len(terms)], (i * 9973) % (max_doc + 50)) for i in range(60)]
    got = {
        int(r["seek_id"]): (int(r["doc_id"]), int(r["tf"]))
        for r in seek_gte_postings(spark, index_small, keys).collect()
    }
    for sid, term, target in keys:
        sub = tdt[(tdt.term == term) & (tdt.doc_id >= target)].sort_values("doc_id")
        if len(sub) == 0:
            assert sid not in got, (sid, term, target)
        else:
            assert got[sid] == (int(sub.iloc[0].doc_id), int(sub.iloc[0].tf)), (sid, term, target)
