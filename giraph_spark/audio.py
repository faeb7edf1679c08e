"""Audio columns: REAL WAV (PCM) decode with the Python standard library.

Round-3 environment re-probe: the container still ships no media
libraries (PIL/soundfile/librosa/av absent), but :mod:`wave` is stdlib —
so unlike JPEG (fake-decoder fallback, see multimodal.py) the audio
modality decodes FOR REAL: RIFF/WAVE container parsing, 16-bit PCM
frames, mono or interleaved multi-channel. Reference analog: the
reference has no media pipeline at all; this is part of the
training-data-pipeline surface the graft adds on top (multimodal
columns as opaque binary + typed metadata, decoded in Arrow-batched
``mapInPandas`` stages — same shape as the PNG path).

Scale notes (100 TB): every stage here is a narrow ``mapInPandas``
transform — no shuffle, partitioning of the input preserved, one
Python worker per partition with Arrow columnar transfer. Feature
extraction is numpy-vectorized per Arrow batch (the per-row work is a
single ``np.frombuffer`` view + reductions). Corrupt or non-PCM
containers degrade to null features instead of failing the stage.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

REAL_WAV_CODEC = True  # decodes with stdlib `wave` — no fake path

FEATURES_SCHEMA = (
    "key string, sample_rate int, n_channels int, n_samples long, "
    "duration_s double, rms double, peak long, zero_crossings long"
)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 samples (shape (n,) mono or (n, channels)) -> WAV bytes."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.ascontiguousarray(arr).tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 array of shape (n_frames, channels), rate).

    Real container parse via stdlib :mod:`wave` (RIFF chunking, fmt
    validation). Only 16-bit PCM is accepted — anything else raises
    ``ValueError`` so callers can degrade explicitly.
    """
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            if w.getsampwidth() != 2:
                raise ValueError(
                    f"only 16-bit PCM supported, got sampwidth={w.getsampwidth()}"
                )
            nch = w.getnchannels()
            rate = w.getframerate()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError, struct.error) as exc:
        raise ValueError(f"not a decodable WAV container: {exc}") from exc
    arr = np.frombuffer(frames, dtype="<i2")
    if nch > 1:
        arr = arr.reshape(-1, nch)
    else:
        arr = arr[:, None]
    return arr, rate


def synth_wav_corpus(
    spark,
    n: int,
    n_samples: int = 400,
    sample_rate: int = 8000,
    coeffs: tuple[int, int] = (7919, 4093),
) -> DataFrame:
    """``n`` REAL WAV-encoded mono clips with closed-form samples —
    sample(k, i) = ((a*k + b*i + 17) mod 65536) - 32768 — so an external
    SQL engine can derive expected features without a WAV decoder: PCM
    is lossless, hence features(decode(encode(S))) == features(S)
    exactly, and any codec defect shows up as an oracle mismatch.
    Returns (key string, data binary); narrow ``mapInPandas`` over
    ``spark.range`` (embarrassingly parallel at any n)."""
    a, b = coeffs
    base = b * np.arange(n_samples, dtype=np.int64) + 17

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ks = pdf["id"].to_numpy(np.int64)
            data = [
                encode_wav(
                    ((a * int(k) + base) % 65536 - 32768).astype(np.int16),
                    sample_rate,
                )
                for k in ks
            ]
            yield pd.DataFrame({"key": ks.astype(str), "data": data})

    return spark.range(n).mapInPandas(gen, schema="key string, data binary")


def audio_features(df: DataFrame, key_col: str, binary_col: str) -> DataFrame:
    """binary WAV -> per-clip feature row (rate, channels, length,
    duration, RMS, peak |amplitude|, zero crossings). Channels are
    averaged into a mono float signal before RMS/peak/crossings (the
    conventional downmix). A row whose bytes fail to decode yields null
    features (format column stays inspectable upstream via
    ``attach_media_metadata``) rather than failing the stage."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            rate = np.full(n, None, dtype=object)
            nch = np.full(n, None, dtype=object)
            nsamp = np.full(n, None, dtype=object)
            dur = np.full(n, None, dtype=object)
            rms = np.full(n, None, dtype=object)
            peak = np.full(n, None, dtype=object)
            zc = np.full(n, None, dtype=object)
            for i, raw in enumerate(pdf[binary_col]):
                if raw is None:
                    continue
                try:
                    arr, r = decode_wav(bytes(raw))
                except ValueError:
                    continue
                mono = arr.astype(np.float64).mean(axis=1)
                rate[i] = int(r)
                nch[i] = int(arr.shape[1])
                nsamp[i] = int(arr.shape[0])
                dur[i] = float(arr.shape[0] / r)
                if arr.shape[0]:
                    rms[i] = float(np.sqrt(np.mean(mono * mono)))
                    peak[i] = int(np.abs(arr.astype(np.int64)).max())
                    nonneg = mono >= 0
                    zc[i] = int(np.count_nonzero(nonneg[1:] != nonneg[:-1]))
                else:
                    rms[i], peak[i], zc[i] = 0.0, 0, 0
            yield pd.DataFrame(
                {
                    "key": pdf[key_col].astype(str),
                    "sample_rate": rate,
                    "n_channels": nch,
                    "n_samples": nsamp,
                    "duration_s": dur,
                    "rms": rms,
                    "peak": peak,
                    "zero_crossings": zc,
                }
            )

    return df.select(key_col, binary_col).mapInPandas(gen, schema=FEATURES_SCHEMA)


def resample_audio(
    df: DataFrame, key_col: str, binary_col: str, new_rate: int
) -> DataFrame:
    """Nearest-neighbor resample to ``new_rate`` and re-encode — the
    uniform-sample-rate normalization step of an audio training
    pipeline. Deterministic index arithmetic (no interpolation filter,
    matching the nearest-neighbor image resize). Returns
    (key string, data binary) with real WAV bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[bytes | None] = [None] * len(pdf)
            for i, raw in enumerate(pdf[binary_col]):
                if raw is None:
                    continue
                try:
                    arr, r = decode_wav(bytes(raw))
                except ValueError:
                    continue
                n_out = max(1, arr.shape[0] * new_rate // r)
                idx = np.arange(n_out, dtype=np.int64) * r // new_rate
                idx = np.minimum(idx, arr.shape[0] - 1)
                out[i] = encode_wav(arr[idx], new_rate)
            yield pd.DataFrame({"key": pdf[key_col].astype(str), "data": out})

    return df.select(key_col, binary_col).mapInPandas(
        gen, schema="key string, data binary"
    )


def audio_windows(
    df: DataFrame,
    key_col: str,
    binary_col: str,
    window: int = 256,
    hop: int | None = None,
) -> DataFrame:
    """Framing: split each clip into fixed-length windows (hop defaults
    to window = non-overlapping) and emit per-window RMS — the
    fan-out shape a spectrogram/VAD stage needs (one input row -> many
    window rows inside the same Arrow batch; ragged tail dropped, the
    standard framing convention). Returns (key, window_index, rms)."""
    hop = hop or window

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys: list[str] = []
            widx: list[int] = []
            wrms: list[float] = []
            for key, raw in zip(pdf[key_col].astype(str), pdf[binary_col]):
                if raw is None:
                    continue
                try:
                    arr, _ = decode_wav(bytes(raw))
                except ValueError:
                    continue
                mono = arr.astype(np.float64).mean(axis=1)
                n_win = (len(mono) - window) // hop + 1 if len(mono) >= window else 0
                if n_win <= 0:
                    continue
                starts = np.arange(n_win) * hop
                frames = mono[starts[:, None] + np.arange(window)]
                r = np.sqrt(np.mean(frames * frames, axis=1))
                keys.extend([key] * n_win)
                widx.extend(range(n_win))
                wrms.extend(float(x) for x in r)
            yield pd.DataFrame(
                {
                    "key": keys,
                    "window_index": pd.Series(widx, dtype="int64"),
                    "rms": pd.Series(wrms, dtype="float64"),
                }
            )

    return df.select(key_col, binary_col).mapInPandas(
        gen, schema="key string, window_index long, rms double"
    )
