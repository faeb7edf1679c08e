"""Real-WAV audio path: stdlib codec round-trips plus the Spark-side
mapInPandas stages (features / resample / windows). End-to-end the
codec is also gated by the ``audio_features`` oracle query (closed-form
samples vs DuckDB); these pin multi-channel handling, corrupt-container
degradation, and the framing arithmetic."""

from __future__ import annotations

import numpy as np
import pytest

from giraph_spark.audio import (
    audio_features,
    audio_windows,
    decode_wav,
    encode_wav,
    resample_audio,
    synth_wav_corpus,
)


def test_roundtrip_mono():
    s = (np.arange(1000) * 37 % 65536 - 32768).astype(np.int16)
    arr, rate = decode_wav(encode_wav(s, 16000))
    assert rate == 16000
    assert arr.shape == (1000, 1)
    assert np.array_equal(arr[:, 0], s)


def test_roundtrip_stereo():
    s = np.stack(
        [np.arange(500, dtype=np.int16), (np.arange(500) * -3).astype(np.int16)],
        axis=1,
    )
    arr, rate = decode_wav(encode_wav(s, 44100))
    assert rate == 44100
    assert arr.shape == (500, 2)
    assert np.array_equal(arr, s)


def test_rejects_garbage():
    with pytest.raises(ValueError, match="not a decodable WAV"):
        decode_wav(b"not audio at all" * 10)


def test_rejects_wrong_sampwidth():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit
        w.setframerate(8000)
        w.writeframes(bytes(64))
    with pytest.raises(ValueError, match="16-bit"):
        decode_wav(buf.getvalue())


def test_features_match_numpy_oracle(spark):
    n, m, rate, (a, b) = 6, 200, 8000, (7919, 4093)
    df = synth_wav_corpus(spark, n, m, rate, (a, b))
    got = {r["key"]: r for r in audio_features(df, "key", "data").collect()}
    assert len(got) == n
    for k in range(n):
        s = ((a * k + b * np.arange(m, dtype=np.int64) + 17) % 65536 - 32768).astype(
            np.float64
        )
        r = got[str(k)]
        assert r["sample_rate"] == rate
        assert r["n_channels"] == 1
        assert r["n_samples"] == m
        assert r["duration_s"] == pytest.approx(m / rate, abs=0)
        assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(s * s))), rel=1e-12)
        assert r["peak"] == int(np.abs(s).max())
        nonneg = s >= 0
        assert r["zero_crossings"] == int(np.count_nonzero(nonneg[1:] != nonneg[:-1]))


def test_features_degrade_on_corrupt_and_null(spark):
    good = encode_wav(np.arange(64, dtype=np.int16), 8000)
    df = spark.createDataFrame(
        [("a", bytearray(good)), ("b", bytearray(b"junk" * 30)), ("c", None)],
        "key string, data binary",
    )
    rows = {r["key"]: r for r in audio_features(df, "key", "data").collect()}
    assert rows["a"]["n_samples"] == 64
    assert rows["b"]["rms"] is None and rows["b"]["sample_rate"] is None
    assert rows["c"]["rms"] is None


def test_resample_halves_length(spark):
    s = (np.arange(800) % 65536 - 32768).astype(np.int16)
    df = spark.createDataFrame(
        [("x", bytearray(encode_wav(s, 16000)))], "key string, data binary"
    )
    out = resample_audio(df, "key", "data", 8000).collect()[0]
    arr, rate = decode_wav(bytes(out["data"]))
    assert rate == 8000
    assert arr.shape[0] == 400
    # nearest-neighbor: sample i comes from source index i*16000//8000 = 2i
    assert np.array_equal(arr[:, 0], s[::2])


def test_windows_fanout_and_rms(spark):
    m, window = 600, 256  # 2 non-overlapping windows, ragged tail dropped
    s = ((np.arange(m) * 3301 + 17) % 65536 - 32768).astype(np.int16)
    df = spark.createDataFrame(
        [("w", bytearray(encode_wav(s, 8000)))], "key string, data binary"
    )
    rows = sorted(
        audio_windows(df, "key", "data", window=window).collect(),
        key=lambda r: r["window_index"],
    )
    assert [r["window_index"] for r in rows] == [0, 1]
    for i, r in enumerate(rows):
        seg = s[i * window : (i + 1) * window].astype(np.float64)
        assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(seg * seg))), rel=1e-12)


def test_windows_hop_overlap(spark):
    s = np.ones(512, dtype=np.int16) * 100
    df = spark.createDataFrame(
        [("h", bytearray(encode_wav(s, 8000)))], "key string, data binary"
    )
    rows = audio_windows(df, "key", "data", window=256, hop=128).collect()
    assert len(rows) == 3  # starts 0,128,256
    assert all(r["rms"] == pytest.approx(100.0) for r in rows)
