"""Real-PNG codec gates: spec-level byte-layout checks (no media libs).

The decoder is also end-to-end gated by the ``media_features`` oracle
query (closed-form pixels -> encode -> decode -> features vs DuckDB),
which catches encoder+decoder defects that don't cancel; these tests
pin the parts a round-trip CAN'T see — per-filter-type reconstruction
against hand-built IDAT streams, CRC validation, and header parsing.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from giraph_spark.png_codec import (
    _chunk,
    _SIGNATURE,
    decode_png,
    encode_png,
    png_dimensions,
)


def _rng(seed=7):
    return np.random.RandomState(seed)


@pytest.mark.parametrize("shape", [(1, 1, 1), (5, 3, 3), (16, 16, 3), (7, 9, 4), (4, 4, 2)])
def test_roundtrip_shapes(shape):
    arr = _rng().randint(0, 256, size=shape).astype(np.uint8)
    out = decode_png(encode_png(arr))
    assert out.shape == shape
    assert np.array_equal(out, arr)


def test_roundtrip_2d_gray():
    arr = _rng(1).randint(0, 256, size=(6, 8)).astype(np.uint8)
    out = decode_png(encode_png(arr))
    assert out.shape == (6, 8, 1)
    assert np.array_equal(out[:, :, 0], arr)


def _png_with_filters(arr: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG whose scanlines use the given filter types,
    computing each filtered byte per the spec (the reference math the
    decoder must invert)."""
    h, w, c = arr.shape
    assert len(filters) == h
    px = arr.astype(np.int32)
    raw = bytearray()
    flat = px.reshape(h, w * c)
    bpp = c
    for y, ftype in enumerate(filters):
        raw.append(ftype)
        prior = flat[y - 1] if y > 0 else np.zeros(w * c, np.int32)
        for x in range(w * c):
            cur = int(flat[y][x])
            a = int(flat[y][x - bpp]) if x >= bpp else 0
            b = int(prior[x])
            cc = int(prior[x - bpp]) if x >= bpp else 0
            if ftype == 0:
                v = cur
            elif ftype == 1:
                v = cur - a
            elif ftype == 2:
                v = cur - b
            elif ftype == 3:
                v = cur - ((a + b) >> 1)
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                v = cur - pred
            raw.append(v & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[c], 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_all_filter_types_reconstruct():
    arr = _rng(3).randint(0, 256, size=(5, 4, 3)).astype(np.uint8)
    png = _png_with_filters(arr, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(png), arr)


def test_filter_types_gray_and_rgba():
    for c, seed in ((1, 11), (4, 13)):
        arr = _rng(seed).randint(0, 256, size=(5, 6, c)).astype(np.uint8)
        png = _png_with_filters(arr, [4, 3, 2, 1, 0])
        assert np.array_equal(decode_png(png), arr)


def test_crc_validation():
    png = bytearray(encode_png(np.zeros((2, 2, 3), np.uint8)))
    png[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))


def test_bad_signature_and_truncation():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNG\r\n\x1a\x00" + b"rest")
    with pytest.raises(ValueError):
        decode_png(_SIGNATURE + b"x" * 600)  # garbage chunk framing


def test_unsupported_profiles_rejected():
    good = encode_png(np.zeros((2, 2, 3), np.uint8))
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = _SIGNATURE + _chunk(b"IHDR", ihdr) + good[len(_SIGNATURE) + 12 + 13 :]
    with pytest.raises(ValueError, match="depth"):
        decode_png(bad)
    # interlaced
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    bad = _SIGNATURE + _chunk(b"IHDR", ihdr) + good[len(_SIGNATURE) + 12 + 13 :]
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bad)


def test_png_dimensions_header_only():
    arr = np.zeros((3, 7, 4), np.uint8)
    assert png_dimensions(encode_png(arr)) == (7, 3, 4)
    with pytest.raises(ValueError):
        png_dimensions(b"\xff\xd8\xffjpeg")


def test_decode_image_real_png_path(spark):
    """A real PNG through the Spark decode stage yields the true pixels
    (not the fake filler), including resize + channel adaptation."""
    from giraph_spark.multimodal import decode_image

    arr = _rng(5).randint(0, 256, size=(8, 8, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [("img", bytearray(encode_png(arr)))], "key string, data binary"
    )
    row = decode_image(df, "key", "data", 8, 8, 3).collect()[0]
    assert row.format == "png"
    assert bytes(row.pixels) == arr.tobytes()
    # gray source replicated into 3 requested channels
    gray = _rng(6).randint(0, 256, size=(4, 4, 1)).astype(np.uint8)
    df2 = spark.createDataFrame(
        [("g", bytearray(encode_png(gray)))], "key string, data binary"
    )
    row2 = decode_image(df2, "key", "data", 4, 4, 3).collect()[0]
    expect = np.repeat(gray, 3, axis=2)
    assert bytes(row2.pixels) == expect.tobytes()


def test_synth_png_corpus_formula(spark):
    """Generated PNGs decode back to the closed-form pixel values the
    media_features oracle derives."""
    from giraph_spark.multimodal import synth_png_corpus

    rows = {r.key: bytes(r.data) for r in synth_png_corpus(spark, 3, 4, 4, 3).collect()}
    a, b, c, d = 7919, 131, 17, 101
    for k, data in rows.items():
        arr = decode_png(data)
        for y in range(4):
            for x in range(4):
                for ch in range(3):
                    assert arr[y, x, ch] == (a * int(k) + b * y + c * x + d * ch) % 256
