"""Pure-Python GIF codec (GIF87a/89a, LZW) — the third REAL image codec
next to :mod:`png_codec` and :mod:`bmp_codec`.

GIF is palette-based and lossless for images with <= 256 distinct
colors, so — like PNG and BMP — decode(encode(P)) == P exactly and the
closed-form feature oracle applies unchanged. The implementation
follows the public GIF89a specification: logical screen descriptor,
global/local color tables, image descriptor, variable-width LZW with
clear/end codes and 12-bit cap, 255-byte data sub-blocks, and the
4-pass interlace row order. Extensions (graphic control, comment,
application) are parsed and skipped; the first image frame is decoded.

With this, the only format left on multimodal.py's marked fake-decoder
path is JPEG (lossy DCT — a from-scratch decoder is possible but its
output could not be value-checked against a closed-form SQL oracle the
way the three lossless formats are).
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# --------------------------------------------------------------------------
# LZW (GIF variant: variable code width, LSB-first bit packing)
# --------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # dictionary as (prefix_code, last_byte) chains — O(1) append, no
    # quadratic byte-string copying
    prefix: list[int] = [-1] * 4096
    suffix: list[int] = [0] * 4096
    for i in range(clear):
        suffix[i] = i
    next_code = end + 1
    code_size = min_code_size + 1
    prev = -1

    acc = 0
    nbits = 0
    stack = bytearray()
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                next_code = end + 1
                code_size = min_code_size + 1
                prev = -1
                continue
            if code == end:
                return out
            if prev == -1:
                if code >= clear:
                    raise ValueError("GIF LZW: first code not a literal")
                out.append(code)
                prev = code
                continue
            if code < next_code:
                cur = code
            elif code == next_code:
                cur = prev  # KwKwK case: emit prev + first(prev)
            else:
                raise ValueError("GIF LZW: code out of range")
            # expand `cur` chain (reversed), plus first byte for KwKwK
            stack.clear()
            c = cur
            while c >= 0:
                stack.append(suffix[c])
                c = prefix[c]
            first = stack[-1]
            out.extend(reversed(stack))
            if code == next_code:
                out.append(first)
            if next_code < 4096:
                prefix[next_code] = prev
                suffix[next_code] = first
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = code
            if len(out) >= n_pixels:
                return out
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for px in indices.tobytes():
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([px])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# container
# --------------------------------------------------------------------------


def encode_gif(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB with <= 256 distinct colors -> GIF89a bytes."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"encode_gif needs (h, w, 3) RGB, got {arr.shape}")
    h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    n_colors = len(palette)
    if n_colors > 256:
        raise ValueError(f"GIF supports <= 256 colors, image has {n_colors}")
    # color table size: 2^(depth), depth in [1, 8]
    depth = max(1, int(np.ceil(np.log2(max(2, n_colors)))))
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[:n_colors] = palette
    min_code_size = max(2, depth)  # spec: LZW min code size >= 2

    parts = [b"GIF89a", struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)]
    parts.append(table.tobytes())
    parts.append(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0))
    parts.append(bytes([min_code_size]))
    lzw = _lzw_encode(indices.astype(np.uint8), min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        parts.append(bytes([len(chunk)]) + chunk)
    parts.append(b"\x00\x3b")
    return b"".join(parts)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> (h, w, 3) uint8 RGB of the first frame, composed on
    the logical screen (background = color 0 where the frame does not
    cover). Interlaced frames are de-interlaced. Raises ``ValueError``
    on malformed containers."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("truncated GIF: global color table")
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"bad GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF: image descriptor")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(data):
                raise ValueError("truncated GIF: local color table")
            ct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame has no color table")
        if pos >= len(data):
            raise ValueError("truncated GIF: missing LZW code size")
        mcs = data[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError(f"bad LZW min code size {mcs}")
        chunks = bytearray()
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            if pos + 1 + ln > len(data):
                raise ValueError("truncated GIF: data sub-block")
            chunks += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(chunks), mcs, w * h)
        if len(idx) < w * h:
            raise ValueError(f"GIF LZW underrun: {len(idx)} of {w * h} pixels")
        frame = np.frombuffer(bytes(idx[: w * h]), np.uint8).reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4-pass order
            order = np.concatenate(
                [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
            )
            de = np.empty_like(frame)
            de[order] = frame
            frame = de
        if frame.max(initial=0) >= len(ct):
            raise ValueError("GIF pixel index out of palette range")
        canvas = np.zeros((sh, sw), dtype=np.uint8)
        canvas[top : top + h, left : left + w] = frame[: sh - top, : sw - left]
        return np.ascontiguousarray(ct[canvas])
    raise ValueError("GIF contains no image frame")
