"""Nearest-neighbor BMP resize and WAV spectral features: index-math,
round-trip, tone-spectrum and Parseval checks."""

import math
import struct

import numpy as np

from postgres_cdc_reconciliation_spark.sources.multimodal import (
    audio_spectral,
    build_bmp,
    decode_bmp,
    resize_images,
)


def _media_df(spark, rows):
    return spark.createDataFrame(rows, "media_id long, kind string, payload binary")


def test_resize_index_math_and_roundtrip(spark):
    mid = 12  # w = 8+12%8 = 12, h = 4+12%4 = 4
    src = _media_df(spark, [(mid, "image", build_bmp(mid)),
                            (99, "audio", b"\x00")])
    out = resize_images(src, out_w=4, out_h=3).collect()
    assert len(out) == 1  # non-image rows dropped
    r = out[0]
    assert (r["width"], r["height"]) == (4, 3)

    # output payload is itself a valid BMP of the declared size
    w2, h2, px2 = decode_bmp(bytes(r["payload"]))
    assert (w2, h2) == (4, 3)

    # every resized pixel equals the generative formula at the sampled
    # source index: src_r = r'*h//out_h, src_c = c'*w//out_w
    w, h = 12, 4
    arr = np.frombuffer(px2, dtype=np.uint8).reshape(3, 4, 3)
    total = 0
    for rp in range(3):
        for cp in range(4):
            for ch in range(3):
                sr, sc = (rp * h) // 3, (cp * w) // 4
                k = sr * (w * 3) + sc * 3 + ch
                want = (mid * 7 + k) % 256
                assert arr[rp, cp, ch] == want
                total += want
    assert r["px_sum"] == total


def _wav_from_samples(samples, rate=8000):
    n = len(samples)
    data = struct.pack(f"<{n}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    riff_size = 4 + (8 + len(fmt)) + (8 + len(data))
    return (
        struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def test_spectral_pure_tone_lands_in_right_band(spark):
    n, f, amp = 64, 5, 1000  # bin 5 of 32 AC bins → band 0 of 4
    tone = [round(amp * math.cos(2 * math.pi * f * k / n)) for k in range(n)]
    src = _media_df(spark, [(1, "audio", _wav_from_samples(tone))])
    r = audio_spectral(src).collect()[0]
    # closed-form: a cosine at an exact bin has AC power amp²/2
    want = amp * amp / 2
    assert abs(r["band0"] - want) / want < 1e-2  # rounding of samples
    assert r["band1"] < want * 1e-3
    assert r["band2"] < want * 1e-3
    assert r["band3"] < want * 1e-3


def test_spectral_parseval(spark):
    # arbitrary deterministic signal: total AC power must equal the
    # time-domain variance (Parseval), computed independently of the FFT
    n = 100
    sig = [((k * k * 37) % 2000) - 1000 for k in range(n)]
    src = _media_df(spark, [(2, "audio", _wav_from_samples(sig))])
    r = audio_spectral(src).collect()[0]
    x = np.asarray(sig, dtype=np.float64)
    want = float((x * x).mean() - x.mean() ** 2)
    assert abs(r["total_power"] - want) / want < 1e-9
    assert abs((r["band0"] + r["band1"] + r["band2"] + r["band3"]) - want) / want < 1e-9


def test_spectral_skips_images(spark):
    src = _media_df(spark, [(3, "image", build_bmp(3))])
    assert audio_spectral(src).count() == 0
