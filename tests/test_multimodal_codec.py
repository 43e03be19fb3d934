"""Codec-path tests for the multimodal operators.

The declared driver queries pin ``codec="stub"`` (environment-
independent oracles over text-byte fixture payloads); the ``pil``
path is the real image codec, exercised here wherever Pillow is
installed and verified to fail LOUDLY where it is not — an
unavailable codec must never silently fall back to the stub.
"""

from __future__ import annotations

import pytest

from connected_component_spark.operators import multimodal as mm


def _payload_df(spark, items):
    """items: [(doc_id, bytes)] -> (doc_id, payload binary) DataFrame."""
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in items], "doc_id long, payload binary"
    )


def test_unknown_codec_rejected(spark):
    df = _payload_df(spark, [(1, b"abc")])
    with pytest.raises(ValueError, match="unknown codec"):
        mm.decode_metadata(df, codec="ffmpeg")


def test_pil_codec_unavailable_raises_loudly(spark):
    """Where Pillow is missing, codec='pil' must raise at call time —
    not decode garbage with the stub."""
    if "pil" in mm.available_codecs():
        pytest.skip("Pillow installed here; the loud-failure branch is moot")
    df = _payload_df(spark, [(1, b"abc")])
    with pytest.raises(RuntimeError, match="requires Pillow"):
        mm.decode_metadata(df, codec="pil")


def _png_bytes(w, h, color=(10, 20, 30)):
    from PIL import Image
    import io

    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


def _gif_bytes(w, h, n_frames):
    from PIL import Image
    import io

    frames = [
        Image.new("P", (w, h), color=i * 20) for i in range(n_frames)
    ]
    buf = io.BytesIO()
    frames[0].save(
        buf, format="GIF", save_all=True, append_images=frames[1:]
    )
    return buf.getvalue()


def test_pil_decode_real_dimensions(spark):
    pytest.importorskip("PIL")
    df = _payload_df(
        spark, [(1, _png_bytes(17, 9)), (2, _png_bytes(40, 30))]
    )
    rows = {r["doc_id"]: r for r in mm.decode_metadata(df, codec="pil").collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["fmt"]) == (17, 9, "rgb")
    assert (rows[2]["width"], rows[2]["height"]) == (40, 30)


def test_pil_resize_buffer_contract(spark):
    pytest.importorskip("PIL")
    df = _payload_df(spark, [(1, _png_bytes(17, 9))])
    row = mm.resize_payload(df, width=8, height=8, codec="pil").first()
    assert row["n_bytes_out"] == 8 * 8 * 3  # RGB pixel buffer, not bytes
    # solid-color image: resize preserves the color, md5 is stable
    again = mm.resize_payload(df, width=8, height=8, codec="pil").first()
    assert row["out_md5"] == again["out_md5"]


def test_pil_frame_sampling(spark):
    pytest.importorskip("PIL")
    df = _payload_df(spark, [(7, _gif_bytes(6, 4, n_frames=5))])
    rows = mm.sample_frames(df, every=2, codec="pil").collect()
    assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [0, 2, 4]
    assert all(r["frame_len"] == 6 * 4 * 3 for r in rows)


def test_stub_codec_unchanged_by_codec_plumbing(spark):
    """The declared-query path (stub) must be byte-identical to the
    pre-parametrization behavior."""
    df = _payload_df(spark, [(1, b"hello world")])
    r = mm.decode_metadata(df).first()
    n = len(b"hello world")
    assert (r["n_bytes"], r["width"], r["height"], r["fmt"]) == (
        n, n % 640 + 1, (n // 7) % 480 + 1, ("rgb", "rgba", "gray")[n % 3]
    )
