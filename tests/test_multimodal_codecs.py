"""Pure-stdlib BMP/WAV codecs: build→decode roundtrip and layout honesty."""

from __future__ import annotations

import struct

from postgres_cdc_reconciliation_spark.sources.multimodal import (
    build_bmp,
    build_wav,
    decode_bmp,
    decode_wav,
)


def test_bmp_roundtrip_with_padding():
    # media_id=3 → w=11, h=3: row_len=33 → 3 pad bytes per row (exercises
    # the stride/padding math)
    payload = build_bmp(3)
    w, h, px = decode_bmp(payload)
    assert (w, h) == (11, 7 % 4 + 4)
    assert len(px) == w * h * 3  # padding stripped
    # decoded pixel bytes reproduce the generative formula exactly
    assert list(px) == [(3 * 7 + k) % 256 for k in range(w * h * 3)]


def test_bmp_rejects_non_bmp():
    try:
        decode_bmp(b"\x89PNG" + b"\x00" * 60)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_wav_roundtrip():
    payload = build_wav(10)
    rate, samples = decode_wav(payload)
    assert rate == 8000
    n = 64 + 10 % 64
    assert samples == [((10 * 31 + k * 17) % 65536) - 32768 for k in range(n)]


def test_wav_chunk_walk_handles_extra_chunks():
    """A LIST/INFO chunk before fmt/data must not derail the parser (real
    encoders emit metadata chunks in arbitrary positions)."""
    base = build_wav(5)
    fmt_and_data = base[12:]
    # odd-length chunk body → RIFF requires a word-alignment pad byte
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOa" + b"\x00"
    rebuilt = (
        struct.pack("<4sI4s", b"RIFF", 4 + len(extra) + len(fmt_and_data), b"WAVE")
        + extra
        + fmt_and_data
    )
    rate, samples = decode_wav(rebuilt)
    assert rate == 8000 and samples == decode_wav(base)[1]


def test_decode_features_dataframe(spark, sf_dir):
    from postgres_cdc_reconciliation_spark.sources.multimodal import (
        decode_features,
        synth_media_real,
    )

    out = decode_features(synth_media_real(spark, sf_dir, every=50)).collect()
    assert len(out) > 0
    for r in out:
        if r["kind"] == "image":
            assert r["width"] * r["height"] == r["n_units"]
            assert 0.0 <= r["mean_a"] <= 255.0
        else:
            assert r["width"] is None and r["n_units"] >= 64
            assert r["mean_b"] >= 0.0  # RMS


def test_decode_image_gate_and_optional_pil():
    """decode_image: real PNG decode when PIL is importable; the documented
    NotImplementedError gate otherwise. Either way the gate's contract is
    exercised — this never silently skips both paths."""
    import pytest

    from postgres_cdc_reconciliation_spark.sources.multimodal import (
        decode_image,
    )

    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False

    # minimal valid 1x1 red PNG (signature + IHDR + IDAT + IEND)
    png = bytes.fromhex(
        "89504e470d0a1a0a0000000d49484452000000010000000108020000009077"
        "3df80000000c4944415408d763f8cfc000000301010018dd8db00000000049"
        "454e44ae426082"
    )
    if has_pil:
        img = decode_image(png)
        assert img.size == (1, 1)
        assert img.convert("RGB").getpixel((0, 0)) == (255, 0, 0)
    else:
        with pytest.raises(NotImplementedError):
            decode_image(png)
