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


# ---- bmp: the always-available REAL codec (r4 verdict #5) -----------------

def _bmp_bytes(pixels):
    """Minimal 24-bit BI_RGB BMP encoder (test fixture generator).
    ``pixels``: list of rows (top-down), each a list of (r, g, b)."""
    import struct

    h, w = len(pixels), len(pixels[0])
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in reversed(pixels):  # file stores rows bottom-up
        line = bytearray()
        for r, g, b in row:
            line += bytes((b, g, r))  # file stores BGR
        line += b"\x00" * (stride - len(line))
        body += line
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header + info + body)


_PX = [
    [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 8, 7)],
    [(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)],
]  # 4x2, includes stride padding (4*3=12 bytes per row, already aligned)


def test_bmp_codec_always_available():
    assert "bmp" in mm.available_codecs()


def test_bmp_decode_real_dimensions(spark):
    data = _bmp_bytes(_PX)
    df = _payload_df(spark, [(1, data)])
    r = mm.decode_metadata(df, codec="bmp").first()
    assert (r["n_bytes"], r["width"], r["height"], r["fmt"]) == (
        len(data), 4, 2, "rgb"
    )


def test_bmp_decode_rejects_non_bmp(spark):
    df = _payload_df(spark, [(1, b"not a bitmap at all, way too short?")])
    with pytest.raises(Exception, match="BM"):
        mm.decode_metadata(df, codec="bmp").collect()


def test_bmp_pixel_roundtrip():
    """The decoder recovers exactly the encoded pixels: BGR->RGB swap,
    bottom-up row order, and stride handling all verified against the
    independent test-side encoder."""
    w, h, rgb = mm._bmp_rgb_pixels(_bmp_bytes(_PX))
    assert (w, h) == (4, 2)
    want = b"".join(bytes(px) for row in _PX for px in row)
    assert rgb == want


def test_bmp_pixel_roundtrip_with_padding():
    """3-wide rows need 3 pad bytes per stride — the path the aligned
    4-wide fixture never exercises."""
    px = [[(1, 2, 3), (4, 5, 6), (7, 8, 9)],
          [(10, 11, 12), (13, 14, 15), (16, 17, 18)]]
    w, h, rgb = mm._bmp_rgb_pixels(_bmp_bytes(px))
    assert (w, h) == (3, 2)
    assert rgb == b"".join(bytes(p) for row in px for p in row)


def test_bmp_resize_nearest_neighbor(spark):
    import hashlib

    df = _payload_df(spark, [(1, _bmp_bytes(_PX))])
    row = mm.resize_payload(df, width=2, height=2, codec="bmp").first()
    assert row["n_bytes_out"] == 2 * 2 * 3
    # floor sampling: out(x,y) <- src(x*4//2, y*2//2) = src(2x, y)
    want = b"".join(
        bytes(_PX[y][x]) for y in (0, 1) for x in (0, 2)
    )
    assert row["out_md5"] == hashlib.md5(want).hexdigest()


def test_bmp_frames_single_frame(spark):
    import hashlib

    df = _payload_df(spark, [(3, _bmp_bytes(_PX))])
    rows = mm.sample_frames(df, codec="bmp").collect()
    assert len(rows) == 1
    r = rows[0]
    want = b"".join(bytes(px) for row_ in _PX for px in row_)
    assert (r["frame_idx"], r["frame_len"]) == (0, len(want))
    assert r["frame_md5"] == hashlib.md5(want).hexdigest()


# ---- wav: the always-available REAL audio codec ---------------------------

def _wav_bytes(samples, rate=8000, channels=1):
    """Minimal 16-bit PCM WAV encoder via the stdlib wave module.
    ``samples``: list of int16 values (interleaved when channels>1)."""
    import array
    import io
    import sys
    import wave

    a = array.array("h", samples)
    if sys.byteorder == "big":
        a.byteswap()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(a.tobytes())
    return buf.getvalue()


def test_wav_codec_always_available():
    assert "wav" in mm.available_audio_codecs()


def test_wav_decode_real_metadata(spark):
    data = _wav_bytes([0, 1000, -1000, 32767], rate=16000, channels=2)
    df = _payload_df(spark, [(1, data)])
    r = mm.decode_audio_metadata(df, codec="wav").first()
    assert (
        r["n_bytes"],
        r["sample_rate"],
        r["channels"],
        r["sample_width"],
        r["n_samples"],
    ) == (len(data), 16000, 2, 2, 2)  # 4 samples / 2 channels = 2 frames
    assert r["duration_ms"] == 2 * 1000 // 16000


def test_wav_decode_rejects_non_wav(spark):
    df = _payload_df(spark, [(1, b"x" * 64)])
    with pytest.raises(Exception):
        mm.decode_audio_metadata(df, codec="wav").collect()


def test_wav_energy_known_values(spark):
    """RMS computed independently: constant amplitude A over a full
    window gives exactly A/32768."""
    import math

    samples = [16384] * 4 + [-16384] * 4  # |s| constant = 16384
    df = _payload_df(spark, [(1, _wav_bytes(samples))])
    rows = sorted(
        mm.audio_energy(df, window=4, codec="wav").collect(),
        key=lambda r: r["window_idx"],
    )
    assert [r["window_idx"] for r in rows] == [0, 1]
    for r in rows:
        assert math.isclose(r["rms"], 16384 / 32768.0, rel_tol=0, abs_tol=0)


def test_wav_energy_partial_tail_window(spark):
    import math

    samples = [100, 200, 300, 400, 500]  # window 4 -> tail of 1
    df = _payload_df(spark, [(1, _wav_bytes(samples))])
    rows = sorted(
        mm.audio_energy(df, window=4, codec="wav").collect(),
        key=lambda r: r["window_idx"],
    )
    assert len(rows) == 2
    want0 = math.sqrt((100**2 + 200**2 + 300**2 + 400**2) / 4) / 32768.0
    want1 = math.sqrt(500**2 / 1) / 32768.0
    assert rows[0]["rms"] == want0
    assert rows[1]["rms"] == want1


def test_audio_stub_energy_matches_bytes(spark):
    """Stub path: exact integer sum-of-squares over the raw bytes."""
    import math

    payload = b"abcd" * 3  # 12 bytes, window 8 -> windows of 8 and 4
    df = _payload_df(spark, [(1, payload)])
    rows = sorted(
        mm.audio_energy(df, window=8, codec="stub").collect(),
        key=lambda r: r["window_idx"],
    )
    b = list(payload)
    want = [
        math.sqrt(sum(v * v for v in b[:8]) / 8) / 255.0,
        math.sqrt(sum(v * v for v in b[8:]) / 4) / 255.0,
    ]
    assert [r["rms"] for r in rows] == want


def test_unknown_audio_codec_rejected(spark):
    df = _payload_df(spark, [(1, b"abc")])
    with pytest.raises(ValueError, match="unknown audio codec"):
        mm.decode_audio_metadata(df, codec="mp3")


def test_bmp_rejects_nonpositive_dimensions():
    """A crafted header with negative width (or zero height) must fail
    LOUDLY: with width*3 negative the pixel-array truncation check is
    vacuously true and the old code returned an empty buffer silently
    (ADVICE r5)."""
    import struct

    import pytest

    good = _bmp_bytes(_PX)
    neg_w = bytearray(good)
    struct.pack_into("<i", neg_w, 18, -4)
    with pytest.raises(ValueError, match="invalid BMP dimensions"):
        mm._decode_bmp(bytes(neg_w))
    with pytest.raises(ValueError, match="invalid BMP dimensions"):
        mm._bmp_rgb_pixels(bytes(neg_w))

    zero_h = bytearray(good)
    struct.pack_into("<i", zero_h, 22, 0)
    with pytest.raises(ValueError, match="invalid BMP dimensions"):
        mm._decode_bmp(bytes(zero_h))

    zero_w = bytearray(good)
    struct.pack_into("<i", zero_w, 18, 0)
    with pytest.raises(ValueError, match="invalid BMP dimensions"):
        mm._decode_bmp(bytes(zero_w))


# ---- ppm: the SECOND always-available real codec (r5 verdict #6) -----------

def _ppm_bytes(pixels, comment=False):
    """Minimal binary-PPM (P6) encoder (test fixture generator).
    ``pixels``: list of rows (top-down), each a list of (r, g, b)."""
    h, w = len(pixels), len(pixels[0])
    head = b"P6\n"
    if comment:
        head += b"# test fixture comment\n"
    head += f"{w} {h}\n255\n".encode()
    body = bytearray()
    for row in pixels:  # P6 stores rows top-down, RGB, no padding
        for r, g, b in row:
            body += bytes((r, g, b))
    return bytes(head + body)


def test_ppm_codec_always_available():
    assert "ppm" in mm.available_codecs()


def test_ppm_decode_real_dimensions(spark):
    data = _ppm_bytes(_PX)
    df = spark.createDataFrame([(1, bytearray(data))], "doc_id long, payload binary")
    row = mm.decode_metadata(df, codec="ppm").collect()[0]
    assert (row["n_bytes"], row["width"], row["height"], row["fmt"]) == (
        len(data),
        4,
        2,
        "rgb",
    )


def test_ppm_header_comment_and_whitespace_forms():
    for comment in (False, True):
        data = _ppm_bytes(_PX, comment=comment)
        assert mm._decode_ppm(data)[1:] == (4, 2, "rgb")


def test_ppm_decode_rejects_bad_payloads(spark):
    import pytest

    with pytest.raises(ValueError, match="P6"):
        mm._decode_ppm(b"not a ppm at all")
    with pytest.raises(ValueError, match="truncated PPM header"):
        mm._decode_ppm(b"P6\n4 ")
    with pytest.raises(ValueError, match="invalid PPM dimensions"):
        mm._decode_ppm(b"P6\n0 2\n255\n")
    with pytest.raises(ValueError, match="maxval=255"):
        mm._decode_ppm(b"P6\n4 2\n65535\n" + b"\x00" * 48)
    # maxval < 255 would need sample rescaling the codec does not do —
    # must be rejected loudly, never decoded as near-black pixels
    with pytest.raises(ValueError, match="maxval=255"):
        mm._decode_ppm(b"P6\n4 2\n15\n" + b"\x00" * 24)
    # a lost separator after the magic is a corrupted header, not
    # width=100
    with pytest.raises(ValueError, match="magic not followed"):
        mm._decode_ppm(b"P6100 50 255\n" + b"\x00" * 48)
    with pytest.raises(ValueError, match="truncated PPM pixel array"):
        mm._ppm_rgb_pixels(b"P6\n4 2\n255\n" + b"\x00" * 10)


def test_ppm_pixel_roundtrip():
    w, h, rgb = mm._ppm_rgb_pixels(_ppm_bytes(_PX))
    assert (w, h) == (4, 2)
    flat = [c for row in _PX for px in row for c in px]
    assert list(rgb) == flat


def test_bmp_ppm_cross_codec_differential(spark):
    """The SAME pixel matrix encoded by two independent container
    formats (BI_RGB bottom-up BGR with stride padding vs P6 top-down
    RGB unpadded) must decode to identical RGB buffers and produce
    identical resize fingerprints through the mapInPandas plumbing —
    a real-codec differential that runs in every environment."""
    px = [
        [((x * 37 + y * 91) % 256, (x * 11) % 256, (y * 53) % 256) for x in range(5)]
        for y in range(3)
    ]  # 5x3: odd width exercises BMP's stride padding vs PPM's none
    assert mm._bmp_rgb_pixels(_bmp_bytes(px)) == mm._ppm_rgb_pixels(_ppm_bytes(px))

    df = spark.createDataFrame(
        [
            (1, bytearray(_bmp_bytes(px))),
            (2, bytearray(_ppm_bytes(px))),
        ],
        "doc_id long, payload binary",
    )
    via_bmp = (
        mm.resize_payload(df.where("doc_id = 1"), width=4, height=4, codec="bmp")
        .collect()[0]
    )
    via_ppm = (
        mm.resize_payload(df.where("doc_id = 2"), width=4, height=4, codec="ppm")
        .collect()[0]
    )
    assert via_bmp["out_md5"] == via_ppm["out_md5"]
    assert via_bmp["n_bytes_out"] == via_ppm["n_bytes_out"] == 4 * 4 * 3

    f_bmp = mm.sample_frames(df.where("doc_id = 1"), codec="bmp").collect()[0]
    f_ppm = mm.sample_frames(df.where("doc_id = 2"), codec="ppm").collect()[0]
    assert f_bmp["frame_md5"] == f_ppm["frame_md5"]


# ---- video: CCV1 clip container over real image frames --------------------

def _clip_px_frames():
    """Three distinct pixel matrices (the 'video')."""
    return [
        [[(255 - x * 40, y * 90, (x * y * 31) % 256) for x in range(4)]
         for y in range(2)],
        [[(x * 60, 255 - y * 80, (x + y) * 50 % 256) for x in range(4)]
         for y in range(2)],
        [[((x * 97) % 256, (y * 53) % 256, 128) for x in range(4)]
         for y in range(2)],
    ]


def test_clip_container_roundtrip_and_errors():
    import pytest

    frames = [b"alpha", b"", b"gamma-longer-frame"]
    clip = mm.pack_clip(frames)
    assert mm.clip_frames(clip) == frames
    assert mm.clip_frames(mm.pack_clip([])) == []
    with pytest.raises(ValueError, match="missing magic"):
        mm.clip_frames(b"MP4?" + clip[4:])
    with pytest.raises(ValueError, match="truncated CCV1 clip header"):
        mm.clip_frames(b"CCV1\x01")
    with pytest.raises(ValueError, match="truncated CCV1 frame payload"):
        mm.clip_frames(clip[:-3])
    with pytest.raises(ValueError, match="truncated CCV1 frame table"):
        mm.clip_frames(mm.pack_clip([b"x"])[:9])


def test_clip_metadata_decodes_first_frame_via_real_codec(spark):
    px = _clip_px_frames()
    clip = mm.pack_clip([_bmp_bytes(p) for p in px])
    df = spark.createDataFrame([(7, bytearray(clip))], "doc_id long, payload binary")
    row = mm.decode_clip_metadata(df, frame_codec="bmp").collect()[0]
    assert (row["n_frames"], row["width"], row["height"], row["fmt"]) == (3, 4, 2, "rgb")
    assert row["total_frame_bytes"] == sum(len(_bmp_bytes(p)) for p in px)


def test_clip_frames_cross_codec_differential(spark):
    """The SAME three pixel matrices packed as a BMP-frame clip and a
    PPM-frame clip must sample to identical per-frame RGB
    fingerprints — the multi-frame (video) extension of the
    single-image cross-codec differential; runs in every
    environment."""
    px = _clip_px_frames()
    df = spark.createDataFrame(
        [
            (1, bytearray(mm.pack_clip([_bmp_bytes(p) for p in px]))),
            (2, bytearray(mm.pack_clip([_ppm_bytes(p) for p in px]))),
        ],
        "doc_id long, payload binary",
    )
    via_bmp = mm.sample_clip_frames(
        df.where("doc_id = 1"), every=1, frame_codec="bmp"
    ).collect()
    via_ppm = mm.sample_clip_frames(
        df.where("doc_id = 2"), every=1, frame_codec="ppm"
    ).collect()
    assert len(via_bmp) == len(via_ppm) == 3
    for b, p in zip(
        sorted(via_bmp, key=lambda r: r["frame_idx"]),
        sorted(via_ppm, key=lambda r: r["frame_idx"]),
    ):
        assert (b["frame_idx"], b["frame_len"], b["frame_md5"]) == (
            p["frame_idx"],
            p["frame_len"],
            p["frame_md5"],
        )


def test_clip_frame_sampling_every_2(spark):
    px = _clip_px_frames()
    clip = mm.pack_clip([_ppm_bytes(p) for p in px])
    df = spark.createDataFrame([(1, bytearray(clip))], "doc_id long, payload binary")
    rows = mm.sample_clip_frames(df, every=2, frame_codec="ppm").collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 2]


def test_encode_bmp_roundtrip():
    w, h, rgb = mm._bmp_rgb_pixels(mm.encode_bmp(_PX))
    assert (w, h) == (4, 2)
    assert list(rgb) == [c for row in _PX for px in row for c in px]


def test_clip_payload_bmp_frames_recover_text_bytes(spark):
    """frame_format="bmp": every frame is a REAL BMP whose decode
    returns exactly the original 24-byte text chunk."""
    text = "abcdefghijklmnopqrstuvwx" * 2 + "tail-dropped"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    clip = mm.with_clip_payload(df, frame_format="bmp").collect()[0]["payload"]
    frames = mm.clip_frames(bytes(clip))
    assert len(frames) == 2  # partial tail chunk dropped
    for i, f in enumerate(frames):
        _w, _h, rgb = mm._bmp_rgb_pixels(f)
        assert bytes(rgb) == text.encode()[i * 24 : i * 24 + 24]


# ---- png: the real COMPRESSED stdlib codec (r6 verdict residue #1) --------

def _px_grid(w, h, seed=0):
    return [
        [((x * 37 + y * 91 + seed) % 256, (x * 11 + seed) % 256, (y * 53) % 256)
         for x in range(w)]
        for y in range(h)
    ]


def test_png_codec_always_available():
    assert "png" in mm.available_codecs()


def test_png_roundtrip_every_filter_type():
    """Encode→decode must be the identity for every scanline filter
    (0-4) and for mixed per-row filters — each de-filter branch of
    the decoder is exercised against the same pixel matrix."""
    px = _px_grid(7, 5)
    flat = bytes(c for row in px for p in row for c in p)
    for ft in [0, 1, 2, 3, 4, "mixed"]:
        w, h, rgb = mm._png_rgb_pixels(mm.encode_png(px, filter_type=ft))
        assert (w, h, rgb) == (7, 5, flat), f"filter {ft}"


def test_png_decode_real_dimensions(spark):
    px = _px_grid(6, 4)
    df = spark.createDataFrame(
        [(1, bytearray(mm.encode_png(px)))], "doc_id long, payload binary"
    )
    row = mm.decode_metadata(df, codec="png").collect()[0]
    assert (row["width"], row["height"], row["fmt"]) == (6, 4, "rgb")


def test_png_rejects_bad_payloads(spark):
    px = _px_grid(4, 3)
    good = mm.encode_png(px)
    with pytest.raises(ValueError, match="bad signature"):
        mm._decode_png(b"JFIF" + good[4:])
    # flip one payload bit: the chunk CRC must catch it before any
    # pixel is decoded — compressed bitstreams turn single-bit damage
    # into arbitrary pixel garbage, so integrity must be checked
    corrupt = bytearray(good)
    corrupt[45] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        mm._png_rgb_pixels(bytes(corrupt))
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        mm._png_rgb_pixels(good[:-6])
    # unsupported shapes fail loudly, never misdecode
    import struct
    import zlib as _z

    def _chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF)
        )

    gray = (
        mm._PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", _z.compress(b"\x00ab\x00cd"))
        + _chunk(b"IEND", b"")
    )
    assert mm._decode_png(gray)[3] == "gray"  # metadata parse is fine
    with pytest.raises(ValueError, match="truecolor"):
        mm._png_rgb_pixels(gray)  # full decode refuses non-RGB
    bad_filter = bytearray(
        mm._PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", _z.compress(b"\x09abc"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unknown PNG filter type 9"):
        mm._png_rgb_pixels(bytes(bad_filter))


def test_png_bmp_ppm_three_codec_differential(spark):
    """The SAME pixel matrix through all three always-available real
    codecs — uncompressed bottom-up BGR (bmp), uncompressed top-down
    RGB (ppm), and the compressed filtered bitstream (png) — must
    produce identical resize and frame fingerprints through the
    mapInPandas plumbing."""
    px = _px_grid(5, 3)  # odd width: stride padding vs none vs filters
    payloads = {
        "bmp": _bmp_bytes(px),
        "ppm": _ppm_bytes(px),
        "png": mm.encode_png(px, filter_type="mixed"),
    }
    assert (
        mm._bmp_rgb_pixels(payloads["bmp"])
        == mm._ppm_rgb_pixels(payloads["ppm"])
        == mm._png_rgb_pixels(payloads["png"])
    )
    resized, framed = {}, {}
    for codec, b in payloads.items():
        df = spark.createDataFrame(
            [(1, bytearray(b))], "doc_id long, payload binary"
        )
        resized[codec] = mm.resize_payload(
            df, width=4, height=4, codec=codec
        ).collect()[0]["out_md5"]
        framed[codec] = mm.sample_frames(df, codec=codec).collect()[0][
            "frame_md5"
        ]
    assert len(set(resized.values())) == 1, resized
    assert len(set(framed.values())) == 1, framed


def test_clip_png_frames_cross_codec_differential(spark):
    """Clip-level: the same three-frame video as PNG frames and BMP
    frames samples to identical per-frame RGB fingerprints."""
    px = _clip_px_frames()
    df = spark.createDataFrame(
        [
            (1, bytearray(mm.pack_clip([mm.encode_png(p, filter_type=i % 5)
                                        for i, p in enumerate(px)]))),
            (2, bytearray(mm.pack_clip([_bmp_bytes(p) for p in px]))),
        ],
        "doc_id long, payload binary",
    )
    via_png = mm.sample_clip_frames(
        df.where("doc_id = 1"), every=1, frame_codec="png"
    ).collect()
    via_bmp = mm.sample_clip_frames(
        df.where("doc_id = 2"), every=1, frame_codec="bmp"
    ).collect()
    assert len(via_png) == len(via_bmp) == 3
    assert sorted(
        (r["frame_idx"], r["frame_len"], r["frame_md5"]) for r in via_png
    ) == sorted((r["frame_idx"], r["frame_len"], r["frame_md5"]) for r in via_bmp)


def test_clip_payload_png_frames_recover_text_bytes(spark):
    """frame_format="png": every frame is a REAL compressed PNG whose
    full decode (inflate + de-filter) returns exactly the original
    24-byte text chunk — the declared-path contract."""
    text = "abcdefghijklmnopqrstuvwx" * 6 + "tail-dropped"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    clip = mm.with_clip_payload(df, frame_format="png").collect()[0]["payload"]
    frames = mm.clip_frames(bytes(clip))
    assert len(frames) == 6  # partial tail chunk dropped
    for i, f in enumerate(frames):
        _w, _h, rgb = mm._png_rgb_pixels(f)
        assert bytes(rgb) == text.encode()[i * 24 : i * 24 + 24]
    # six frames rotate through filter types 0..4 (then 0 again)
    idat_filters = set()
    import zlib as _z

    for f in frames:
        for t, d in mm._png_chunks(bytes(f)):
            if t == b"IDAT":
                idat_filters.add(_z.decompress(d)[0])
    assert idat_filters == {0, 1, 2, 3, 4}


def test_png_pil_interop_differential(spark):
    """Where Pillow exists: Pillow must decode our stdlib-encoded PNG
    to the same RGB buffer our decoder produces (independent-author
    differential for the compressed codec)."""
    if "pil" in mm.available_codecs():
        from PIL import Image
        import io as _io

        px = _px_grid(5, 4, seed=9)
        b = mm.encode_png(px, filter_type="mixed")
        with Image.open(_io.BytesIO(b)) as im:
            pil_rgb = im.convert("RGB").tobytes()
        assert pil_rgb == mm._png_rgb_pixels(b)[2]
    else:
        pytest.skip("Pillow absent; stdlib round-trip covers the codec here")


def test_encoders_reject_empty_or_ragged_pixels():
    """review r7: encoders fail loudly on degenerate input instead of
    IndexError / zero-dimension payloads."""
    for enc in (mm.encode_png, mm.encode_bmp, mm.encode_gif):
        with pytest.raises(ValueError, match="non-empty"):
            enc([])
        with pytest.raises(ValueError, match="non-empty"):
            enc([[]])
        with pytest.raises(ValueError, match="same width"):
            enc([[(1, 2, 3), (4, 5, 6)], [(7, 8, 9)]])


# ---- GIF: the second real compressed codec (LZW) ---------------------------


def _gif_imgdesc_offset(b: bytes) -> int:
    """Offset of the image descriptor in our encoder's output: header
    (13) + global color table (a 0x2C BYTE may legitimately occur
    inside palette data, so searching for it is wrong)."""
    assert b[10] & 0x80
    return 13 + 3 * (1 << ((b[10] & 0x07) + 1))


def test_gif_codec_always_available():
    assert "gif" in mm.available_codecs()


def test_gif_pixel_roundtrip():
    px = _px_grid(7, 5)
    flat = bytes(c for row in px for p in row for c in p)
    assert mm._gif_rgb_pixels(mm.encode_gif(px)) == (7, 5, flat)


def test_gif_lzw_width_growth_and_table_reset():
    """A stream long enough to push LZW through every code width up
    to 12 bits and a table-full CLEAR/reset must still round-trip
    exactly (the width-sync off-by-one class of LZW bug corrupts
    exactly these streams, never tiny ones)."""
    data = bytes((i * i + 7 * i) % 251 for i in range(30_000))
    assert mm._lzw_decode(8, mm._lzw_encode(8, data)) == data
    rep = (bytes(range(4)) * 3 + b"\x00" * 50) * 3000  # repetitive: fills fast
    assert mm._lzw_decode(2, mm._lzw_encode(2, rep)) == rep
    # pixel-level: 256-color image large enough to fill the 12-bit table
    cols = [(i, 255 - i, (i * 37) % 256) for i in range(256)]
    px = [[cols[(x * x + 3 * y + (x * y) % 17) % 256] for x in range(120)]
          for y in range(90)]
    flat = bytes(c for row in px for p in row for c in p)
    assert mm._gif_rgb_pixels(mm.encode_gif(px)) == (120, 90, flat)


def test_gif_decode_real_dimensions(spark):
    px = _px_grid(6, 4)
    df = spark.createDataFrame(
        [(1, bytearray(mm.encode_gif(px)))], "doc_id long, payload binary"
    )
    row = mm.decode_metadata(df, codec="gif").collect()[0]
    assert (row["width"], row["height"], row["fmt"]) == (6, 4, "indexed")


def test_gif_rejects_bad_payloads():
    px = _px_grid(4, 3)
    good = mm.encode_gif(px)
    with pytest.raises(ValueError, match="bad signature"):
        mm._decode_gif(b"JFIF" + good[4:])
    with pytest.raises(ValueError, match="truncated|without EOI"):
        mm._gif_rgb_pixels(good[:-12])
    # >256 distinct colors cannot be palettized
    many = [[(x % 256, y, (x + y) % 256) for x in range(300)] for y in range(2)]
    with pytest.raises(ValueError, match="256 distinct colors"):
        mm.encode_gif(many)
    # interlace flag: loud refusal, never a silently re-ordered decode
    interlaced = bytearray(good)
    desc = _gif_imgdesc_offset(good)
    assert good[desc] == 0x2C
    interlaced[desc + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        mm._gif_rgb_pixels(bytes(interlaced))
    # unknown block type between header and image
    broken = bytearray(good)
    broken[desc] = 0x7F
    with pytest.raises(ValueError, match="unknown GIF block"):
        mm._gif_rgb_pixels(bytes(broken))


def test_gif_skips_extension_blocks():
    """Real-world GIFs carry a Graphic Control Extension before the
    image descriptor; the decoder must walk past any extension by its
    sub-block structure."""
    px = _px_grid(5, 4)
    good = mm.encode_gif(px)
    desc = _gif_imgdesc_offset(good)
    assert good[desc] == 0x2C
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # label, 4-byte block, term
    comment = b"\x21\xfe\x05hello\x00"
    spliced = good[:desc] + gce + comment + good[desc:]
    flat = bytes(c for row in px for p in row for c in p)
    assert mm._gif_rgb_pixels(spliced) == (5, 4, flat)


def test_gif_four_codec_differential(spark):
    """The SAME pixel matrix through all four always-available real
    codecs — bmp (bottom-up BGR), ppm (top-down RGB), png (deflate +
    filters), gif (LZW + palette) — must produce identical resize and
    frame fingerprints through the mapInPandas plumbing."""
    px = _px_grid(5, 3)
    payloads = {
        "bmp": _bmp_bytes(px),
        "ppm": _ppm_bytes(px),
        "png": mm.encode_png(px, filter_type="mixed"),
        "gif": mm.encode_gif(px),
    }
    assert (
        mm._bmp_rgb_pixels(payloads["bmp"])
        == mm._ppm_rgb_pixels(payloads["ppm"])
        == mm._png_rgb_pixels(payloads["png"])
        == mm._gif_rgb_pixels(payloads["gif"])
    )
    resized, framed = {}, {}
    for codec, b in payloads.items():
        df = spark.createDataFrame(
            [(1, bytearray(b))], "doc_id long, payload binary"
        )
        resized[codec] = mm.resize_payload(
            df, width=4, height=4, codec=codec
        ).collect()[0]["out_md5"]
        framed[codec] = mm.sample_frames(df, codec=codec).collect()[0][
            "frame_md5"
        ]
    assert len(set(resized.values())) == 1, resized
    assert len(set(framed.values())) == 1, framed


def test_clip_payload_gif_frames_recover_text_bytes(spark):
    """frame_format="gif": every frame is a REAL LZW-compressed GIF
    whose full decode (variable-width codes + palette) returns exactly
    the original 24-byte text chunk — the declared-path contract."""
    text = "abcdefghijklmnopqrstuvwx" * 6 + "tail-dropped"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    clip = mm.with_clip_payload(df, frame_format="gif").collect()[0]["payload"]
    frames = mm.clip_frames(bytes(clip))
    assert len(frames) == 6  # partial tail chunk dropped
    for i, f in enumerate(frames):
        assert f[:6] == b"GIF89a"
        _w, _h, rgb = mm._gif_rgb_pixels(f)
        assert bytes(rgb) == text.encode()[i * 24 : i * 24 + 24]


def test_clip_gif_frames_cross_codec_differential(spark):
    """Clip-level: the same three-frame video as GIF frames and PNG
    frames samples to identical per-frame RGB fingerprints."""
    px = _clip_px_frames()
    df = spark.createDataFrame(
        [
            (1, bytearray(mm.pack_clip([mm.encode_gif(p) for p in px]))),
            (2, bytearray(mm.pack_clip([mm.encode_png(p, filter_type=i % 5)
                                        for i, p in enumerate(px)]))),
        ],
        "doc_id long, payload binary",
    )
    via_gif = mm.sample_clip_frames(
        df.where("doc_id = 1"), every=1, frame_codec="gif"
    ).collect()
    via_png = mm.sample_clip_frames(
        df.where("doc_id = 2"), every=1, frame_codec="png"
    ).collect()
    assert len(via_gif) == len(via_png) == 3
    assert sorted(
        (r["frame_idx"], r["frame_len"], r["frame_md5"]) for r in via_gif
    ) == sorted((r["frame_idx"], r["frame_len"], r["frame_md5"]) for r in via_png)


def test_gif_pil_interop_differential():
    """Where Pillow exists: Pillow must decode our stdlib-encoded GIF
    to the same RGB buffer our decoder produces (independent-author
    differential for the LZW codec)."""
    if "pil" in mm.available_codecs():
        import io as _io

        from PIL import Image

        px = _px_grid(5, 4, seed=9)
        b = mm.encode_gif(px)
        with Image.open(_io.BytesIO(b)) as im:
            pil_rgb = im.convert("RGB").tobytes()
        assert pil_rgb == mm._gif_rgb_pixels(b)[2]
    else:
        pytest.skip("Pillow absent; stdlib round-trip covers the codec here")


# ---- property-based codec differentials (hypothesis) ----------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except Exception:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:
    _px_strategy = st.integers(1, 9).flatmap(
        lambda w: st.lists(
            st.lists(
                st.tuples(
                    st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
                ),
                min_size=w,
                max_size=w,
            ),
            min_size=1,
            max_size=9,
        )
    )

    @settings(max_examples=60, deadline=None)
    @given(
        px=_px_strategy,
        ft=st.sampled_from([0, 1, 2, 3, 4, "mixed"]),
    )
    def test_png_roundtrip_property(px, ft):
        """Any pixel matrix, any filter choice: encode→decode is the
        identity, and the three real codecs agree on the RGB buffer —
        the property the hand-picked matrices can't sweep."""
        flat = bytes(c for row in px for p in row for c in p)
        w, h = len(px[0]), len(px)
        got = mm._png_rgb_pixels(mm.encode_png(px, filter_type=ft))
        assert got == (w, h, flat)
        assert mm._bmp_rgb_pixels(mm.encode_bmp(px)) == (w, h, flat)
        assert mm._ppm_rgb_pixels(_ppm_bytes(px)) == (w, h, flat)
        assert mm._gif_rgb_pixels(mm.encode_gif(px)) == (w, h, flat)

    @settings(max_examples=30, deadline=None)
    @given(px=_px_strategy, cut=st.integers(10, 200))
    def test_gif_truncation_never_silent(px, cut):
        """Truncating an encoded GIF anywhere after the signature must
        raise ValueError (or decode identically if the cut only
        removed bytes at/after the trailer) — never wrong pixels."""
        b = mm.encode_gif(px)
        cut = min(cut, len(b) - 1)
        if cut < 6:
            return
        flat = bytes(c for row in px for p in row for c in p)
        try:
            got = mm._gif_rgb_pixels(b[:cut])
        except ValueError:
            return  # loud failure: the contract
        assert got == (len(px[0]), len(px), flat)

    @settings(max_examples=30, deadline=None)
    @given(px=_px_strategy, cut=st.integers(10, 200))
    def test_png_truncation_never_silent(px, cut):
        """Truncating an encoded PNG anywhere after the signature must
        raise ValueError (or decode identically if the cut only
        removed bytes past IEND) — never return wrong pixels."""
        b = mm.encode_png(px)
        cut = min(cut, len(b) - 1)
        if cut < 8:
            return  # signature-level truncation is covered elsewhere
        truncated = b[:cut]
        flat = bytes(c for row in px for p in row for c in p)
        try:
            got = mm._png_rgb_pixels(truncated)
        except ValueError:
            return  # loud failure: the contract
        assert got == (len(px[0]), len(px), flat)
