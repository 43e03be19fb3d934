"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed by Arrow-batched ``mapInPandas``.

Design for 100 TB: media bytes ride as a ``binary`` column next to
typed metadata; decode / feature-extraction runs as ``mapInPandas``
over Arrow batches so Python touches data once per batch, not per
row, and the schema contract is explicit.  The actual codec step is
STUBBED (this container has no image/audio libraries): decode
produces a deterministic fake derived from the byte stream, clearly
marked below.  The Spark-side plumbing — binary encoding, batch
iteration, output schema, partition preservation — is real and
tested; swapping the stub for PIL/ffmpeg is a local change inside
``_decode_stub``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_binary_payload",
    "decode_metadata",
    "extract_features",
    "resize_payload",
    "sample_frames",
    "DECODE_SCHEMA",
    "FEATURE_SCHEMA",
    "RESIZE_SCHEMA",
    "FRAME_SCHEMA",
]

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, fmt string"
)
FEATURE_SCHEMA = "doc_id long, features array<double>"
RESIZE_SCHEMA = "doc_id long, width long, height long, n_bytes_out long, out_md5 string"
FRAME_SCHEMA = "doc_id long, frame_idx long, frame_len long, frame_md5 string"


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque media payload column.  The fixtures carry no
    real media, so the payload is the UTF-8 encoding of ``text`` —
    the point is the ``binary`` column contract, not the content."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


def _decode_stub(payload: bytes) -> tuple[int, int, int, str]:
    """STUB decoder (no media libs in this environment).

    Deterministic fake 'image header parse' from the byte stream;
    replace with a real codec (PIL / soundfile / pyav) in production.
    Raises nothing — a real implementation would NotImplementedError
    on unsupported formats.
    """
    n = len(payload)
    width = n % 640 + 1
    height = (n // 7) % 480 + 1
    fmt = ("rgb", "rgba", "gray")[n % 3]
    return n, width, height, fmt


def decode_metadata(docs_with_payload: DataFrame) -> DataFrame:
    """Extract typed metadata from binary payloads via mapInPandas.

    One Arrow batch in, one out; no shuffle — runs map-side wherever
    the payload partitions already live.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_decode_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                decoded, columns=["n_bytes", "width", "height", "fmt"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return docs_with_payload.mapInPandas(batches, schema=DECODE_SCHEMA)


def extract_features(docs_with_payload: DataFrame, dim: int = 8) -> DataFrame:
    """STUB feature extractor: (doc_id, features array<double>).

    The fake embedding is a deterministic function of the byte-sum of
    the payload (a real implementation runs a vision/audio encoder on
    the decoded media).  1 row in → 1 row out; map-side only.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, feats = [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                s = sum(p)
                ids.append(doc_id)
                feats.append([((s * (i + 1)) % 997) / 997.0 for i in range(dim)])
            yield pd.DataFrame({"doc_id": ids, "features": feats})

    return docs_with_payload.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_payload(
    docs_with_payload: DataFrame, width: int = 32, height: int = 32
) -> DataFrame:
    """STUB resize: re-buffer the payload to exactly width×height×3
    bytes (cycle-and-truncate stands in for real resampling) and
    fingerprint the result.  Returns metadata + md5, not the bytes —
    at 100 TB the resized media would be written to a sink column,
    not collected."""
    target = width * height * 3

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                reps = -(-target // max(len(p), 1))
                out = (bytes(p) * reps)[:target]
                rows.append(
                    (doc_id, width, height, len(out), hashlib.md5(out).hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_bytes_out", "out_md5"],
            )

    return docs_with_payload.mapInPandas(batches, schema=RESIZE_SCHEMA)


def sample_frames(
    docs_with_payload: DataFrame, frame_size: int = 64, every: int = 2
) -> DataFrame:
    """STUB frame sampler: split the payload into ``frame_size``-byte
    frames (a real implementation seeks keyframes in a video
    container) and keep every ``every``-th.  Demonstrates the 1→N
    mapInPandas shape: one input row explodes into a row per sampled
    frame, still with no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                n_frames = max(-(-len(b) // frame_size), 1)
                for idx in range(0, n_frames, every):
                    frame = b[idx * frame_size : (idx + 1) * frame_size]
                    rows.append(
                        (doc_id, idx, len(frame), hashlib.md5(frame).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_len", "frame_md5"]
            )

    return docs_with_payload.mapInPandas(batches, schema=FRAME_SCHEMA)
