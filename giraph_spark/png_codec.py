"""Real PNG codec in pure Python + stdlib zlib — no media libraries.

The container ships no PIL/imageio/cv2 (re-probed each round), but PNG
needs only DEFLATE, which the stdlib provides. This makes the
multimodal decode path a *real* codec for PNG containers instead of the
round-1/2 deterministic fake: ``decode_png`` parses the actual byte
layout (signature, chunk framing + CRC32 validation, IHDR geometry,
IDAT inflate, full scanline un-filtering for all five PNG filter
types), and ``encode_png`` produces spec-conformant files any external
tool can open.

Scope: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), non-interlaced — the shapes a training-data pipeline
normalizes to anyway. Palette (3) and 16-bit raise ``ValueError``
naming the unsupported field rather than decoding garbage.

Scale note: this runs inside Arrow-batched ``mapInPandas`` workers
(giraph_spark.multimodal), one image per call; the per-image cost is
dominated by zlib, which is C. At 100 TB the same stage shape holds —
decode is a narrow partition-preserving map, no shuffle.

Reference parity: the reference engine has no media path at all; this
module exists for the pipeline-operators tier of the build brief.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 2: 4, 4: 6}  # channels -> color type


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """uint8 array (h, w) or (h, w, c) with c in {1,2,3,4} -> PNG bytes.

    Filter type 0 (None) per scanline — simplest conformant stream;
    decoders must handle all filters regardless, and ``decode_png``
    does.
    """
    if arr.dtype != np.uint8:
        raise ValueError(f"encode_png needs uint8 pixels, got {arr.dtype}")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3:
        raise ValueError(f"encode_png needs (h, w[, c]) shape, got {arr.shape}")
    h, w, c = arr.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = 0  # filter type None on every scanline
    raw[:, 1:] = arr.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Reverse PNG scanline filtering (types 0-4) -> (h, w, c) uint8."""
    stride = w * c
    data = np.frombuffer(raw, dtype=np.uint8)
    if data.size != h * (1 + stride):
        raise ValueError(
            f"IDAT payload is {data.size} bytes; geometry needs {h * (1 + stride)}"
        )
    rows = data.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = c  # bytes per pixel at bit depth 8
    for y in range(h):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            line = cur
        elif ftype == 2:  # Up
            line = (cur + prior) & 0xFF
        else:
            line = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0  # left (already decoded)
                b = prior[x]  # up
                if ftype == 1:  # Sub
                    v = cur[x] + a
                elif ftype == 3:  # Average
                    v = cur[x] + ((a + b) >> 1)
                elif ftype == 4:  # Paeth
                    cc = int(prior[x - bpp]) if x >= bpp else 0  # up-left
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = cc
                    v = cur[x] + pred
                else:
                    raise ValueError(f"unknown PNG filter type {ftype} on row {y}")
                line[x] = v & 0xFF
        out[y] = line.astype(np.uint8)
    return out.reshape(h, w, c)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w, c). Validates signature, chunk
    CRCs, and geometry; raises ``ValueError`` on anything malformed or
    out of the supported profile (8-bit, color types 0/2/4/6,
    non-interlaced)."""
    if not data.startswith(_SIGNATURE):
        raise ValueError("not a PNG: bad signature")
    pos = len(_SIGNATURE)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("no IHDR chunk")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlace not supported")
    if not idat:
        raise ValueError("no IDAT data")
    raw = zlib.decompress(bytes(idat))
    return _unfilter(raw, h, w, _CHANNELS[color_type])


def png_dimensions(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the IHDR alone — header-only
    metadata extraction, no inflate (the cheap scan-stage variant)."""
    if not data.startswith(_SIGNATURE) or data[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    w, h, depth, color_type = struct.unpack(">IIBB", data[16:26])
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    return int(w), int(h), _CHANNELS[color_type]
