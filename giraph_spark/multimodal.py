"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with
a typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages (one Python process per
partition, columnar transfer, no per-row Python). This module makes the
Spark-side plumbing real — schemas, batch iteration, partition-preserving
transforms — while the actual codec is pluggable:

- **PNG bytes decode for real** via :mod:`giraph_spark.png_codec`
  (pure Python + stdlib zlib — signature/CRC/IHDR parsing, IDAT
  inflate, full filter reconstruction). No external library needed.
- **BMP bytes decode for real** via :mod:`giraph_spark.bmp_codec`
  (24-bit BI_RGB: header validation, stride/padding, bottom-up and
  top-down orientations). Also pure stdlib.
- **GIF bytes decode for real** via :mod:`giraph_spark.gif_codec`
  (variable-width LZW, color tables, sub-blocks, interlacing).
- **WAV audio decodes for real** in :mod:`giraph_spark.audio`
  (stdlib :mod:`wave` — RIFF parse, 16-bit PCM, multi-channel).
- if ``PIL`` is importable, other formats (JPEG/...) use it;
- otherwise the remaining formats fall back to a **deterministic fake
  decoder** (clearly marked: ``FAKE_DECODER = True``) that synthesizes
  a pixel buffer as a pure function of the input bytes. The container
  ships no media libraries (re-probed round 3: PIL/imageio/cv2/
  soundfile/librosa/av all absent), so of the sniffed formats only
  JPEG remains on the fake path (lossy DCT — a closed-form SQL oracle
  cannot value-check it the way the lossless formats are checked);
  PNG, BMP, GIF and WAV are exercised end-to-end with real codecs and
  value-checked oracles (``media_features``, ``bmp_features``,
  ``gif_features``, ``audio_features``).

Format sniffing (``attach_media_metadata``) is real: magic-byte
detection for PNG/JPEG/GIF/WAV/MP4, vectorized over the Arrow batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from giraph_spark.bmp_codec import decode_bmp, encode_bmp
from giraph_spark.gif_codec import decode_gif, encode_gif
from giraph_spark.png_codec import decode_png, encode_png

REAL_PNG_CODEC = True  # PNG decodes for real (pure stdlib); see png_codec
REAL_BMP_CODEC = True  # BMP (24-bit BI_RGB) likewise; see bmp_codec
REAL_GIF_CODEC = True  # GIF (LZW, interlace) likewise; see gif_codec

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    FAKE_DECODER = False
except Exception:  # noqa: BLE001
    FAKE_DECODER = True  # non-PNG formats only; PNG is always real

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"RIFF", "wav"),  # refined below (RIFF....WAVE)
    (b"BM", "bmp"),
]

METADATA_SCHEMA = "format string, n_bytes long"
DECODED_SCHEMA = (
    "key string, format string, width int, height int, channels int, pixels binary"
)


def sniff_format(data: bytes) -> str:
    if data[4:8] == b"ftyp":
        return "mp4"
    for magic, name in _MAGIC:
        if data.startswith(magic):
            if name == "wav" and data[8:12] != b"WAVE":
                continue
            return name
    return "unknown"


def attach_media_metadata(
    df: DataFrame, binary_col: str, out_col: str = "media_meta"
) -> DataFrame:
    """Add a typed metadata struct (format, n_bytes) from magic bytes."""

    @F.pandas_udf(METADATA_SCHEMA)
    def _meta(data: pd.Series) -> pd.DataFrame:
        fmts = data.map(lambda b: sniff_format(bytes(b)) if b is not None else None)
        sizes = data.map(lambda b: len(b) if b is not None else 0)
        return pd.DataFrame({"format": fmts, "n_bytes": sizes})

    return df.withColumn(out_col, _meta(F.col(binary_col)))


def _fake_pixels(data: bytes, width: int, height: int, channels: int) -> bytes:
    """Deterministic fake 'decode': pixel buffer = repeatable PRNG stream
    seeded from the byte content. NOT a real codec — stands in for PIL in
    environments without media libraries (FAKE_DECODER marks this)."""
    seed = int.from_bytes(
        np.frombuffer(data[:8].ljust(8, b"\0"), dtype=np.uint8).tobytes(), "little"
    ) ^ len(data)
    rng = np.random.RandomState(seed % (2**31))
    return rng.randint(0, 256, size=width * height * channels, dtype=np.uint16).astype(
        np.uint8
    ).tobytes()


def _fit_pixels(arr: np.ndarray, width: int, height: int, channels: int) -> bytes:
    """Nearest-neighbor resize + channel adaptation of a decoded (h,w,c)
    array to the requested uniform output shape (gray replicates into
    extra channels; alpha/extras are dropped)."""
    h, w, c = arr.shape
    if (h, w) != (height, width):
        ys = np.arange(height) * h // height
        xs = np.arange(width) * w // width
        arr = arr[ys[:, None], xs, :]
    if c < channels:
        arr = np.repeat(arr[:, :, :1], channels, axis=2)
    elif c > channels:
        arr = arr[:, :, :channels]
    return np.ascontiguousarray(arr).tobytes()


def decode_image(
    df: DataFrame,
    key_col: str,
    binary_col: str,
    width: int = 32,
    height: int = 32,
    channels: int = 3,
) -> DataFrame:
    """binary -> decoded pixel buffer rows (key, format, width, height,
    channels, pixels). Arrow-batched; partitioning of the input is
    preserved (narrow transform — no shuffle).

    PNG bytes take the REAL decode path (:mod:`giraph_spark.png_codec`)
    regardless of environment; other formats use PIL when importable,
    else the marked deterministic fake."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        zero = bytes(width * height * channels)
        for pdf in batches:
            raws = pdf[binary_col]
            # null guard: a null binary cell yields format=None + zero
            # pixels instead of a TypeError that fails the whole stage
            fmts = raws.map(lambda b: None if b is None else sniff_format(bytes(b)))

            def _decode(b) -> bytes:
                if b is None:
                    return zero
                b = bytes(b)
                fmt = sniff_format(b)
                if fmt in ("png", "bmp", "gif"):
                    real = {"png": decode_png, "bmp": decode_bmp, "gif": decode_gif}
                    try:
                        return _fit_pixels(real[fmt](b), width, height, channels)
                    except ValueError:
                        # corrupt container: degrade to the deterministic
                        # filler rather than failing the whole 100 TB stage
                        pass
                if not FAKE_DECODER:  # pragma: no cover - PIL path
                    import io

                    from PIL import Image as _I

                    img = _I.open(io.BytesIO(b)).convert("RGB").resize(
                        (width, height)
                    )
                    return np.asarray(img, dtype=np.uint8).tobytes()
                return _fake_pixels(b, width, height, channels)

            pix = raws.map(_decode)
            yield pd.DataFrame(
                {
                    "key": pdf[key_col].astype(str),
                    "format": fmts,
                    "width": np.int32(width),
                    "height": np.int32(height),
                    "channels": np.int32(channels),
                    "pixels": pix,
                }
            )

    return df.select(key_col, binary_col).mapInPandas(gen, schema=DECODED_SCHEMA)


def synth_png_corpus(
    spark,
    n: int,
    width: int = 16,
    height: int = 16,
    channels: int = 3,
    coeffs: tuple[int, int, int, int] = (7919, 131, 17, 101),
) -> DataFrame:
    """``n`` REAL PNG-encoded images whose pixel values follow a closed
    form — pixel(k, y, x, ch) = (a*k + b*y + c*x + d*ch) mod 256 — so an
    external SQL engine can derive expected features without a PNG
    decoder: PNG is lossless, hence features(decode(encode(P))) ==
    features(P) exactly, and any codec defect shows up as an oracle
    mismatch. Returns (key string, data binary); generation is a narrow
    mapInPandas over ``spark.range`` (embarrassingly parallel at any n).
    """
    a, b, c, d = coeffs
    y = np.arange(height, dtype=np.int64)[:, None, None]
    x = np.arange(width, dtype=np.int64)[None, :, None]
    ch = np.arange(channels, dtype=np.int64)[None, None, :]
    base = b * y + c * x + d * ch

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ks = pdf["id"].to_numpy(np.int64)
            data = [
                encode_png(((a * int(k) + base) % 256).astype(np.uint8))
                for k in ks
            ]
            yield pd.DataFrame({"key": ks.astype(str), "data": data})

    return spark.range(n).mapInPandas(gen, schema="key string, data binary")


def synth_bmp_corpus(
    spark,
    n: int,
    width: int = 16,
    height: int = 16,
    coeffs: tuple[int, int, int, int] = (7919, 131, 17, 101),
) -> DataFrame:
    """Same closed-form pixel corpus as :func:`synth_png_corpus` but
    encoded as REAL 24-bit BMP bytes (:mod:`giraph_spark.bmp_codec`) —
    BMP is lossless, so decode(encode(P)) == P exactly and the same SQL
    oracle applies. Channels fixed at 3 (24-bit format)."""
    a, b, c, d = coeffs
    y = np.arange(height, dtype=np.int64)[:, None, None]
    x = np.arange(width, dtype=np.int64)[None, :, None]
    ch = np.arange(3, dtype=np.int64)[None, None, :]
    base = b * y + c * x + d * ch

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ks = pdf["id"].to_numpy(np.int64)
            data = [
                encode_bmp(((a * int(k) + base) % 256).astype(np.uint8))
                for k in ks
            ]
            yield pd.DataFrame({"key": ks.astype(str), "data": data})

    return spark.range(n).mapInPandas(gen, schema="key string, data binary")


def synth_gif_corpus(
    spark,
    n: int,
    width: int = 16,
    height: int = 16,
    n_colors: int = 61,
    coeffs: tuple[int, int, int] = (7919, 131, 17),
    pal_coeffs: tuple[int, int, int, int, int, int] = (5, 1, 7, 3, 11, 9),
) -> DataFrame:
    """Closed-form PALETTE image corpus encoded as REAL GIF bytes
    (:mod:`giraph_spark.gif_codec`): pixel index(k, y, x) =
    (a*k + b*y + c*x) mod n_colors, palette[i] = ((p*i + q) mod 256,
    (r*i + s) mod 256, (t*i + u) mod 256). GIF is lossless for
    palettized images, so decode(encode(P)) == P exactly and a SQL
    engine derives expected features from the two formulas without a
    GIF decoder. Returns (key string, data binary)."""
    a, b, c = coeffs
    p, q, r, s, t, u = pal_coeffs
    i = np.arange(n_colors, dtype=np.int64)
    palette = np.stack(
        [(p * i + q) % 256, (r * i + s) % 256, (t * i + u) % 256], axis=1
    ).astype(np.uint8)
    y = np.arange(height, dtype=np.int64)[:, None]
    x = np.arange(width, dtype=np.int64)[None, :]
    base = b * y + c * x

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ks = pdf["id"].to_numpy(np.int64)
            data = [
                encode_gif(palette[(a * int(k) + base) % n_colors])
                for k in ks
            ]
            yield pd.DataFrame({"key": ks.astype(str), "data": data})

    return spark.range(n).mapInPandas(gen, schema="key string, data binary")


def image_features(decoded: DataFrame) -> DataFrame:
    """Per-image feature vector from the pixel buffer: per-channel mean /
    std plus a luma histogram sketch — real vectorized arithmetic over
    whatever buffer the decoder produced. Returns
    (key, mean: array<double>, std: array<double>, histogram: array<long>)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # group rows by shape so each group is ONE stacked ndarray op
            # (decode_image emits uniform dims, so this is a single group)
            shapes = list(zip(pdf["height"], pdf["width"], pdf["channels"]))
            out_mean = [None] * len(pdf)
            out_std = [None] * len(pdf)
            out_hist = [None] * len(pdf)
            by_shape: dict[tuple, list[int]] = {}
            for i, s in enumerate(shapes):
                by_shape.setdefault((int(s[0]), int(s[1]), int(s[2])), []).append(i)
            for (h, w, c), idxs in by_shape.items():
                stack = np.stack(
                    [
                        np.frombuffer(pdf["pixels"].iloc[i], dtype=np.uint8).reshape(
                            h, w, c
                        )
                        for i in idxs
                    ]
                ).astype(np.float64)
                m = stack.mean(axis=(1, 2))  # (n, c)
                sd = stack.std(axis=(1, 2))
                luma = stack.mean(axis=3)  # (n, h, w)
                # vectorized 8-bin histogram over [0,256) per image
                bins = np.minimum((luma // 32).astype(np.int64), 7).reshape(
                    len(idxs), -1
                )
                hist = np.stack(
                    [np.bincount(row, minlength=8) for row in bins]
                )
                for j, i in enumerate(idxs):
                    out_mean[i] = [float(x) for x in m[j]]
                    out_std[i] = [float(x) for x in sd[j]]
                    out_hist[i] = [int(x) for x in hist[j]]
            yield pd.DataFrame(
                {
                    "key": pdf["key"],
                    "mean": out_mean,
                    "std": out_std,
                    "histogram": out_hist,
                }
            )

    return decoded.mapInPandas(
        gen,
        schema="key string, mean array<double>, std array<double>, histogram array<long>",
    )


def resize_image(decoded: DataFrame, new_width: int, new_height: int) -> DataFrame:
    """Nearest-neighbor resize of the decoded pixel buffer — pure numpy
    index arithmetic, same output schema as ``decode_image``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_pix: list[bytes | None] = [None] * len(pdf)
            # group rows by source shape so each group resizes as ONE
            # stacked fancy-index (decode_image emits uniform dims, so
            # this is normally a single group — same pattern as
            # image_features)
            by_shape: dict[tuple[int, int, int], list[int]] = {}
            for i, (h, w, c) in enumerate(
                zip(pdf["height"], pdf["width"], pdf["channels"])
            ):
                by_shape.setdefault((int(h), int(w), int(c)), []).append(i)
            for (h, w, c), idxs in by_shape.items():
                stack = np.stack(
                    [
                        np.frombuffer(pdf["pixels"].iloc[i], dtype=np.uint8).reshape(
                            h, w, c
                        )
                        for i in idxs
                    ]
                )
                ys = (np.arange(new_height) * h // new_height).astype(np.int64)
                xs = (np.arange(new_width) * w // new_width).astype(np.int64)
                resized = stack[:, ys[:, None], xs, :]  # (n, H', W', c)
                for j, i in enumerate(idxs):
                    out_pix[i] = resized[j].tobytes()
            yield pd.DataFrame(
                {
                    "key": pdf["key"],
                    "format": pdf["format"],
                    "width": np.int32(new_width),
                    "height": np.int32(new_height),
                    "channels": pdf["channels"],
                    "pixels": out_pix,
                }
            )

    return decoded.mapInPandas(gen, schema=DECODED_SCHEMA)


def sample_frames(
    df: DataFrame,
    key_col: str,
    binary_col: str,
    frame_bytes: int = 1024,
    every_n: int = 10,
) -> DataFrame:
    """Video frame sampling plumbing: split the container bytes into
    fixed-size pseudo-frames and keep every n-th (a real demuxer slots in
    here; the batching/explode shape is what matters at scale — one input
    row fans out to many frame rows inside the same Arrow batch).
    Returns (key, frame_index, frame: binary)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, idxs, frames = [], [], []
            for key, raw in zip(pdf[key_col].astype(str), pdf[binary_col]):
                b = bytes(raw)
                n = max(1, len(b) // frame_bytes)
                for i in range(0, n, every_n):
                    keys.append(key)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"key": keys, "frame_index": pd.Series(idxs, dtype="int64"),
                 "frame": frames}
            )

    return df.select(key_col, binary_col).mapInPandas(
        gen, schema="key string, frame_index long, frame binary"
    )
