"""Multimodal columns: opaque binary payloads + typed metadata.

The engine treats image/audio/video as `binary` columns with a typed metadata
struct, processed by Arrow-batched `mapInPandas` operators. The image/audio
codec libraries are NOT in this container, so the decode step is STUBBED
(clearly marked) behind an import-try with a deterministic fake; everything
Spark-side — schema, batch iteration, partitioning, UDF signatures, output
shapes — is real and tested, so swapping the stub for PIL/librosa is a
one-function change.

At 100 TB the payload column dominates: every operator here selects only the
columns it needs (Catalyst prunes payload out of metadata-only plans), and
feature extraction streams Arrow batches — payload bytes never concentrate on
the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FEATURES = 16  # byte-histogram bins for the fake feature extractor
FRAME_BYTES = 64  # fake video: fixed-size frames concatenated


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table from documents: (doc_id, media_type, width,
    height, n_bytes, payload). Payload bytes derive from the text via md5
    chaining — stable across runs/partitionings."""
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.encode(
        F.concat(F.md5("text"), F.md5(F.concat(F.lit("p2:"), "text")), F.md5(F.concat(F.lit("p3:"), "text"))),
        "UTF-8",
    )
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        (F.col("doc_id") % 64 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 48 + 16).cast("int").alias("height"),
        F.length(payload).cast("int").alias("n_bytes"),
        payload.alias("payload"),
    )


def _try_real_decoder():
    try:  # pragma: no cover - PIL absent in this container
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode: real implementation would be PIL/turbojpeg. The fake is
    deterministic: bytes tiled into a (height, width) uint8 array."""
    if _try_real_decoder() is not None:
        raise NotImplementedError(
            "real image decode intentionally not wired in this sandbox; "
            "swap decode_image_stub for PIL.Image.open when available"
        )
    arr = np.frombuffer(payload, dtype=np.uint8)
    reps = -(-(width * height) // arr.size)
    return np.tile(arr, reps)[: width * height].reshape(height, width)


FEATURE_SCHEMA = "doc_id long, media_type string, features array<double>"


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction: byte histogram (N_FEATURES bins,
    L1-normalized) per payload. The real version would run a vision/audio
    model over the decoded tensor — identical dataflow shape."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=N_FEATURES).astype(np.float64)
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        batches, FEATURE_SCHEMA
    )


RESIZE_SCHEMA = "doc_id long, width int, height int, payload binary"


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: selects image rows, rewrites metadata, and truncates/
    tiles payload deterministically (STUB for a real resampling kernel)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = target_w * target_h
        for pdf in it:
            out = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                reps = -(-n // arr.size)
                out.append(np.tile(arr, reps)[:n].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": np.full(len(pdf), target_w, dtype=np.int32),
                    "height": np.full(len(pdf), target_h, dtype=np.int32),
                    "payload": out,
                }
            )

    return (
        media.filter(F.col("media_type") == "image")
        .select("doc_id", "payload")
        .mapInPandas(batches, RESIZE_SCHEMA)
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary"


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for 'video' payloads: fixed-size frame slicing, every
    n-th frame kept — real byte plumbing, STUB for a container demuxer."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            doc_ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) // FRAME_BYTES
                for i in range(0, n_frames, every_n):
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    frames.append(payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames if frames else pd.Series([], dtype=object),
                }
            )

    return (
        media.filter(F.col("media_type") == "video")
        .select("doc_id", "payload")
        .mapInPandas(batches, FRAME_SCHEMA)
    )
