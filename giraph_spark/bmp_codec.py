"""Pure-stdlib BMP codec (24-bit uncompressed BI_RGB) — the second REAL
image codec next to :mod:`giraph_spark.png_codec`.

BMP is the simplest widely-used raster container: a 14-byte file
header, a 40-byte BITMAPINFOHEADER, then raw BGR pixel rows stored
bottom-up with each row padded to a 4-byte boundary. That makes a
complete, standards-correct implementation feasible without any
library — so the multimodal pipeline exercises a second lossless
format end-to-end (encode -> decode -> features == closed form).

Structure layout follows the public Windows BITMAPFILEHEADER /
BITMAPINFOHEADER documentation. Top-down images (negative biHeight)
are accepted on decode; encode always writes the canonical bottom-up
orientation.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")  # bfType, bfSize, res1, res2, bfOffBits
_INFO_HDR = struct.Struct("<IiiHHIIiiII")


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array -> 24-bit BI_RGB BMP bytes."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"encode_bmp needs (h, w, 3) RGB, got {arr.shape}")
    h, w, _ = arr.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    # bottom-up, BGR channel order
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :row_bytes] = arr[::-1, :, ::-1].reshape(h, row_bytes)
    off = _FILE_HDR.size + _INFO_HDR.size
    size = off + h * stride
    return (
        _FILE_HDR.pack(b"BM", size, 0, 0, off)
        + _INFO_HDR.pack(_INFO_HDR.size, w, h, 1, 24, 0, h * stride, 2835, 2835, 0, 0)
        + body.tobytes()
    )


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (h, w, 3) uint8 RGB array.

    Validates the magic, header sizes, bit depth, and that the pixel
    array fits in the buffer; raises ``ValueError`` on anything else so
    callers can degrade per-row instead of failing the stage.
    """
    if len(data) < _FILE_HDR.size + _INFO_HDR.size:
        raise ValueError("truncated BMP: shorter than headers")
    magic, _, _, _, off = _FILE_HDR.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP: bad magic")
    (hdr_size, w, h, planes, bpp, comp, _, _, _, _, _) = _INFO_HDR.unpack_from(
        data, _FILE_HDR.size
    )
    if hdr_size < _INFO_HDR.size:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if planes != 1 or comp != 0 or bpp != 24:
        raise ValueError(
            f"only 24-bit BI_RGB supported (planes={planes} bpp={bpp} comp={comp})"
        )
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"bad dimensions {w}x{h}")
    stride = (w * 3 + 3) & ~3
    if off + h * stride > len(data):
        raise ValueError("truncated BMP: pixel array exceeds buffer")
    rows = np.frombuffer(data, dtype=np.uint8, count=h * stride, offset=off)
    arr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        arr = arr[::-1]
    return np.ascontiguousarray(arr[:, :, ::-1])  # BGR -> RGB
