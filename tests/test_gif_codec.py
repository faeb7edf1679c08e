"""Real-GIF codec gates: LZW + container checks per the public GIF89a
spec. End-to-end the codec is also gated by the ``gif_features`` oracle
query; these pin what a round-trip can't see — variable code-width
growth, the KwKwK case, dictionary reset at 4096, sub-block chunk
boundaries, interlace row order, and header validation."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from giraph_spark.gif_codec import (
    _INTERLACE_PASSES,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _rng(seed=7):
    return np.random.RandomState(seed)


@pytest.mark.parametrize("n_colors", [2, 5, 17, 64, 256])
def test_roundtrip_color_counts(n_colors):
    rng = _rng(n_colors)
    palette = rng.randint(0, 256, size=(n_colors, 3)).astype(np.uint8)
    # ensure distinct palette rows so the color count is exact
    palette = np.unique(palette, axis=0)
    idx = rng.randint(0, len(palette), size=(13, 9))
    arr = palette[idx]
    out = decode_gif(encode_gif(arr))
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


def test_roundtrip_large_forces_code_growth():
    # 128x128 with 200 colors: LZW table grows through several widths
    rng = _rng(1)
    palette = np.unique(rng.randint(0, 256, size=(200, 3)).astype(np.uint8), axis=0)
    arr = palette[rng.randint(0, len(palette), size=(128, 128))]
    assert np.array_equal(decode_gif(encode_gif(arr)), arr)


def test_lzw_dictionary_reset_at_4096():
    # long noisy stream at depth 8 exceeds 4096-entry table -> mid-stream
    # clear code; decode must resync
    rng = _rng(2)
    idx = rng.randint(0, 256, size=200_000).astype(np.uint8)
    enc = _lzw_encode(idx, 8)
    dec = _lzw_decode(enc, 8, len(idx))
    assert np.array_equal(np.frombuffer(bytes(dec), np.uint8), idx)


def test_lzw_kwkwk_case():
    # "ababab..." style stream produces the code==next_code case
    idx = np.array([0, 1, 0, 1, 0, 1, 0, 1, 0, 1], dtype=np.uint8)
    enc = _lzw_encode(idx, 2)
    assert bytes(_lzw_decode(enc, 2, len(idx))) == idx.tobytes()


def test_single_color_image():
    arr = np.full((7, 5, 3), 42, dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(arr)), arr)


def test_subblock_chunking():
    # big image -> LZW stream >> 255 bytes -> many sub-blocks
    rng = _rng(3)
    palette = np.unique(rng.randint(0, 256, size=(64, 3)).astype(np.uint8), axis=0)
    arr = palette[rng.randint(0, len(palette), size=(64, 64))]
    data = encode_gif(arr)
    assert len(data) > 600  # necessarily multiple sub-blocks
    assert np.array_equal(decode_gif(data), arr)


def test_interlaced_decode():
    rng = _rng(4)
    palette = np.unique(rng.randint(0, 256, size=(16, 3)).astype(np.uint8), axis=0)
    arr = palette[rng.randint(0, len(palette), size=(11, 6))]
    data = bytearray(encode_gif(arr))
    # rewrite as interlaced: set the flag and permute pixel rows into
    # 4-pass order, re-encoding the LZW stream
    h, w = arr.shape[:2]
    order = np.concatenate([np.arange(s, h, st) for s, st in _INTERLACE_PASSES])
    # image descriptor offset: header(13) + GCT (encoder always writes one)
    i = 13 + 3 * (2 << (data[10] & 0x07))
    assert data[i] == 0x2C
    struct.pack_into("<B", data, i + 9, 0x40)  # interlace flag
    # rebuild pixel indices in interlaced order
    pal, idx = np.unique(arr.reshape(-1, 3), axis=0, return_inverse=True)
    idx = idx.reshape(h, w)[order].astype(np.uint8)
    mcs = data[i + 10]
    lzw = _lzw_encode(idx.reshape(-1), mcs)
    body = bytearray()
    for j in range(0, len(lzw), 255):
        chunk = lzw[j : j + 255]
        body += bytes([len(chunk)]) + chunk
    new = bytes(data[: i + 11]) + bytes(body) + b"\x00\x3b"
    assert np.array_equal(decode_gif(new), arr)


def test_extension_blocks_skipped():
    arr = _rng(5).randint(0, 2, size=(4, 4, 3)).astype(np.uint8) * 200
    data = bytearray(encode_gif(arr))
    i = 13 + 3 * (2 << (data[10] & 0x07))
    assert data[i] == 0x2C
    # inject a graphic-control extension before the image descriptor
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    new = bytes(data[:i]) + gce + bytes(data[i:])
    assert np.array_equal(decode_gif(new), arr)


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda d: b"NOTAGIF" + d[7:], "signature"),
        (lambda d: d[:20], "truncated"),
        (lambda d: d[:6] + d[6:].replace(b"\x2c", b"\x7a", 1), "bad GIF block"),
    ],
)
def test_rejects_corrupt(mutate, msg):
    arr = _rng(6).randint(0, 4, size=(6, 6, 3)).astype(np.uint8) * 60
    with pytest.raises(ValueError, match=msg):
        decode_gif(mutate(encode_gif(arr)))


def test_rejects_too_many_colors():
    rng = _rng(8)
    # 32x32 random RGB has ~1024 distinct colors almost surely
    arr = rng.randint(0, 256, size=(32, 32, 3)).astype(np.uint8)
    if len(np.unique(arr.reshape(-1, 3), axis=0)) <= 256:  # pragma: no cover
        pytest.skip("unlucky RNG produced <=256 colors")
    with pytest.raises(ValueError, match="256 colors"):
        encode_gif(arr)
