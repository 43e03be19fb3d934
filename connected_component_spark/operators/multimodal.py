"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed by Arrow-batched ``mapInPandas``.

Design for 100 TB: media bytes ride as a ``binary`` column next to
typed metadata; decode / feature-extraction runs as ``mapInPandas``
over Arrow batches so Python touches data once per batch, not per
row, and the schema contract is explicit.

Codec selection is an EXPLICIT parameter, never an environment sniff:

* ``codec="stub"`` (default) — a deterministic fake derived from the
  byte stream, clearly marked below.  The declared driver queries pin
  this codec so their oracles are environment-independent (and the
  fixture payloads are text bytes, not real media).
* ``codec="pil"`` — the real image codec (Pillow), available only
  where the library is installed (:func:`available_codecs`); asking
  for it without the library raises loudly instead of silently
  falling back.  The Spark-side plumbing — binary encoding, batch
  iteration, output schema, partition preservation — is identical
  for both codecs and is what the fixture tests exercise; the pil
  path is exercised by import-gated tests wherever Pillow exists.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional real image codec — absent in many runtimes
    from PIL import Image as _PILImage
except Exception:  # pragma: no cover - environment-dependent
    _PILImage = None

__all__ = [
    "with_binary_payload",
    "decode_metadata",
    "extract_features",
    "resize_payload",
    "sample_frames",
    "available_codecs",
    "DECODE_SCHEMA",
    "FEATURE_SCHEMA",
    "RESIZE_SCHEMA",
    "FRAME_SCHEMA",
]


def available_codecs() -> tuple[str, ...]:
    """Codecs usable in this runtime (``stub`` always; ``pil`` when
    Pillow imports)."""
    return ("stub", "pil") if _PILImage is not None else ("stub",)


def _require_codec(codec: str) -> None:
    if codec not in ("stub", "pil"):
        raise ValueError(f"unknown codec {codec!r}; use one of ('stub', 'pil')")
    if codec == "pil" and _PILImage is None:
        raise RuntimeError(
            "codec='pil' requires Pillow, which is not installed in this "
            "runtime; available: " + repr(available_codecs())
        )

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
    """STUB decoder: deterministic fake 'image header parse' from the
    byte stream — the codec for fixtures whose payloads are not real
    media.  Raises nothing."""
    n = len(payload)
    width = n % 640 + 1
    height = (n // 7) % 480 + 1
    fmt = ("rgb", "rgba", "gray")[n % 3]
    return n, width, height, fmt


_PIL_FMT = {"RGB": "rgb", "RGBA": "rgba", "L": "gray"}


def _decode_pil(payload: bytes) -> tuple[int, int, int, str]:
    """Real image header parse via Pillow.  Raises (PIL's
    UnidentifiedImageError) on bytes that are not a decodable image —
    loud failure over a silently wrong answer."""
    with _PILImage.open(io.BytesIO(bytes(payload))) as im:
        fmt = _PIL_FMT.get(im.mode, im.mode.lower())
        return len(payload), im.width, im.height, fmt


def decode_metadata(
    docs_with_payload: DataFrame, codec: str = "stub"
) -> DataFrame:
    """Extract typed metadata from binary payloads via mapInPandas.

    One Arrow batch in, one out; no shuffle — runs map-side wherever
    the payload partitions already live.  ``codec``: see module
    docstring.
    """
    _require_codec(codec)
    decode = _decode_pil if codec == "pil" else _decode_stub

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode(p) for p in pdf["payload"]]
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
    docs_with_payload: DataFrame,
    width: int = 32,
    height: int = 32,
    codec: str = "stub",
) -> DataFrame:
    """Resize to width×height and fingerprint the result.  Returns
    metadata + md5, not the bytes — at 100 TB the resized media would
    be written to a sink column, not collected.

    ``codec="stub"`` re-buffers the payload to exactly
    width×height×3 bytes (cycle-and-truncate stands in for real
    resampling); ``codec="pil"`` decodes, nearest-neighbor-resamples
    (deterministic across Pillow builds, unlike antialiased filters)
    to RGB width×height, and fingerprints the raw pixel buffer."""
    _require_codec(codec)
    target = width * height * 3

    def stub_one(p: bytes) -> bytes:
        reps = -(-target // max(len(p), 1))
        return (bytes(p) * reps)[:target]

    def pil_one(p: bytes) -> bytes:
        with _PILImage.open(io.BytesIO(bytes(p))) as im:
            return (
                im.convert("RGB")
                .resize((width, height), _PILImage.NEAREST)
                .tobytes()
            )

    resize_one = pil_one if codec == "pil" else stub_one

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                out = resize_one(p)
                rows.append(
                    (doc_id, width, height, len(out), hashlib.md5(out).hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_bytes_out", "out_md5"],
            )

    return docs_with_payload.mapInPandas(batches, schema=RESIZE_SCHEMA)


def sample_frames(
    docs_with_payload: DataFrame,
    frame_size: int = 64,
    every: int = 2,
    codec: str = "stub",
) -> DataFrame:
    """Frame sampler — the 1→N mapInPandas shape: one input row
    explodes into a row per sampled frame, still with no shuffle.

    ``codec="stub"`` splits the payload into ``frame_size``-byte
    chunks and keeps every ``every``-th.  ``codec="pil"`` seeks real
    frames of an animated container (GIF/APNG/TIFF via Pillow's
    ``seek``), keeps every ``every``-th, and fingerprints each
    frame's RGB pixel buffer (``frame_size`` is ignored — real frames
    have their own dimensions).  A full video path would swap Pillow
    for pyav behind the same signature."""
    _require_codec(codec)

    def stub_frames(p: bytes):
        b = bytes(p)
        n_frames = max(-(-len(b) // frame_size), 1)
        for idx in range(0, n_frames, every):
            frame = b[idx * frame_size : (idx + 1) * frame_size]
            yield idx, len(frame), hashlib.md5(frame).hexdigest()

    def pil_frames(p: bytes):
        with _PILImage.open(io.BytesIO(bytes(p))) as im:
            n_frames = getattr(im, "n_frames", 1)
            for idx in range(0, n_frames, every):
                im.seek(idx)
                raw = im.convert("RGB").tobytes()
                yield idx, len(raw), hashlib.md5(raw).hexdigest()

    frames_of = pil_frames if codec == "pil" else stub_frames

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                for idx, ln, md5 in frames_of(p):
                    rows.append((doc_id, idx, ln, md5))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_len", "frame_md5"]
            )

    return docs_with_payload.mapInPandas(batches, schema=FRAME_SCHEMA)
