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

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["with_binary_payload", "decode_metadata", "DECODE_SCHEMA"]

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, fmt string"
)


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
