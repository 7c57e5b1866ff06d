"""Payload-codec matrix (grenad src/compression.rs:231-247 round-trip port):
a zlib-compressed index must return results identical to the uncompressed
one, through both search modes and compaction."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from grenad_spark.functions.varbyte import (
    PAYLOAD_CODECS,
    compress_payload,
    decompress_payload,
)
from grenad_spark.index.build import build_index
from grenad_spark.query.bm25 import REFERENCE_QUERIES
from grenad_spark.query.search import search_topk


@given(st.binary(max_size=5000), st.sampled_from(PAYLOAD_CODECS))
@settings(max_examples=60, deadline=None)
def test_codec_roundtrip(data, codec):
    assert decompress_payload(compress_payload(data, codec), codec) == data


def test_zlib_index_rank_identical(spark, docs_small, index_small, tmp_path):
    zidx = build_index(
        spark, docs_small, str(tmp_path / "z"), n_shards=3, payload_codec="zlib"
    )
    assert zidx.payload_codec == "zlib"

    def norm(df):
        return sorted(map(tuple, df.toPandas().values.tolist()))

    for mode in ("exhaustive", "wand", "wand_cursor"):
        a = norm(search_topk(spark, index_small, REFERENCE_QUERIES, mode=mode))
        b = norm(search_topk(spark, zidx, REFERENCE_QUERIES, mode=mode))
        assert a == b, mode
