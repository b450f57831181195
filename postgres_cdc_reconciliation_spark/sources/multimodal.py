"""[EXT] Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for a 100 TB media pipeline:
- media rows are (id, kind, payload BINARY, meta STRUCT) — payloads never
  leave executors, never inflate into Python objects row-at-a-time;
- decode / feature-extract / resize / frame-sample run as ``mapInPandas``
  (Arrow-batched: one pandas DataFrame per partition chunk, zero-copy
  binary transfer), partitioned by id hash so batches are balanced;
- the *decode* step itself (PIL/ffmpeg) is STUBBED in this container (no
  media libs): ``decode_image`` raises NotImplementedError unless a decoder
  is importable, and ``extract_features`` computes deterministic
  byte-level features instead — the Spark-side plumbing (schema, Arrow
  batch shape, partitioning) is real and oracle-tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, content_hash string, "
    "f0 double, f1 double, f2 double, f3 double"
)


def synth_media(spark, sf_dir: str) -> DataFrame:
    """Deterministic fake media derived from orders (scales with sf).

    Payload = unhex(md5(id) || md5(id||'x')) → 32 opaque bytes; kind and
    meta from modulo. Reproducible identically in DuckDB for oracle tests.
    """
    from ..session import spread_scan

    # spread_scan (r14 opt, guide §2.5): the md5 payload synthesis and
    # every downstream codec mapInPandas inherit the scan's partitioning —
    # a single-row-group orders file would run them on ONE core
    o = spread_scan(
        spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            F.col("o_orderkey").alias("media_id")
        )
    )
    sid = F.col("media_id").cast("string")
    kind = (
        F.when(F.col("media_id") % 3 == 0, "image")
        .when(F.col("media_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return o.select(
        "media_id",
        kind.alias("kind"),
        F.unhex(F.concat(F.md5(sid), F.md5(F.concat(sid, F.lit("x"))))).alias(
            "payload"
        ),
        F.struct(
            (F.col("media_id") % 1920).cast("int").alias("width"),
            (F.col("media_id") % 1080).cast("int").alias("height"),
            (F.col("media_id") % 60000).cast("int").alias("duration_ms"),
            F.when(kind == "image", "png")
            .when(kind == "audio", "wav")
            .otherwise("mp4")
            .alias("format"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - optional fast path
    """Compressed-format decode needs PIL/libvips (absent here) — see
    decode_bmp for the real pure-stdlib path used by the pipeline."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError(
            "compressed image decode requires PIL; use BMP + decode_bmp here"
        ) from e


# ---------------------------------------------------------------------------
# Real pure-stdlib codecs: uncompressed 24bpp BMP and PCM16 WAV.
#
# These make the decode step REAL in this container (no PIL/ffmpeg needed):
# builders emit genuine spec-compliant files, decoders parse them back by
# struct layout — file header offsets, row padding, RIFF chunk walk — and
# the oracle recomputes the expected statistics from the generative formula,
# so a decoder that misreads the pixel offset, forgets the 4-byte row pad,
# or grabs the wrong chunk fails the correctness gate.
# ---------------------------------------------------------------------------

import struct


def build_bmp(media_id: int) -> bytes:
    """Deterministic 24bpp bottom-up BMP. Pixel byte k (counting storage
    order, padding excluded) = (media_id*7 + k) % 256."""
    w = 8 + media_id % 8
    h = 4 + media_id % 4
    row_len = w * 3
    pad = (4 - row_len % 4) % 4
    stride = row_len + pad
    img_size = stride * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    body = bytearray()
    k = 0
    for _row in range(h):
        for _i in range(row_len):
            body.append((media_id * 7 + k) % 256)
            k += 1
        body.extend(b"\x00" * pad)
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a 24bpp BMP: returns (width, height, pixel bytes sans padding).

    Reads the declared pixel-array offset from the file header and the
    dimensions from the DIB header; strips per-row padding."""
    magic, _fsize, _r1, _r2, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _hsize, w, h, _planes, bpp = struct.unpack_from("<IiiHH", payload, 14)
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    row_len = w * 3
    stride = (row_len + 3) & ~3
    rows = []
    for r in range(abs(h)):
        start = offset + r * stride
        rows.append(payload[start : start + row_len])
    return w, abs(h), b"".join(rows)


def build_wav(media_id: int, sample_rate: int = 8000) -> bytes:
    """Deterministic mono PCM16 WAV. Sample k = ((media_id*31 + k*17) %
    65536) - 32768."""
    n = 64 + media_id % 64
    samples = [
        ((media_id * 31 + k * 17) % 65536) - 32768 for k in range(n)
    ]
    data = struct.pack(f"<{n}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    riff_size = 4 + (8 + len(fmt)) + (8 + len(data))
    return (
        struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Parse a PCM16 WAV by walking RIFF chunks (any chunk order).

    Returns (sample_rate, samples)."""
    riff, _size, wave = struct.unpack_from("<4sI4s", payload, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sample_rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt_tag, channels, sample_rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if fmt_tag != 1 or channels != 1 or bits != 16:
                raise ValueError("only mono PCM16 supported")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, list(struct.unpack(f"<{len(data) // 2}h", data))


def synth_media_real(spark, sf_dir: str, every: int = 10) -> DataFrame:
    """Media table whose image/audio payloads are REAL files (BMP/WAV built
    by the codecs above), sampled every `every`-th order key. Video stays an
    opaque payload (no stdlib container format) and is excluded here."""
    from ..session import spread_scan

    # spread_scan (r14 opt, guide §2.5): the BMP/WAV builders and the
    # decoder mapInPandas downstream otherwise run single-task on a
    # single-row-group scan; per-row codecs — bit-identical payloads
    ids = spread_scan(
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.col("o_orderkey").alias("media_id"))
        .filter((F.col("media_id") % every == 0) & (F.col("media_id") % 3 != 2))
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mids = pdf["media_id"]
            kinds = ["image" if m % 3 == 0 else "audio" for m in mids]
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "kind": kinds,
                    "payload": [
                        build_bmp(int(m)) if k == "image" else build_wav(int(m))
                        for m, k in zip(mids, kinds)
                    ],
                }
            )

    return ids.mapInPandas(gen, "media_id long, kind string, payload binary")


DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_units long, "
    "mean_a double, mean_b double, mean_c double"
)


def decode_features(media: DataFrame) -> DataFrame:
    """REAL decode + feature extraction over binary media (mapInPandas).

    Per kind:
    - image (BMP): width, height, n_units = pixel count, mean_a/b/c = mean
      B/G/R channel values (storage is BGR triples);
    - audio (WAV): n_units = sample count, mean_a = mean amplitude,
      mean_b = RMS, mean_c = duration in ms (floor, from the PARSED header
      sample rate).

    All statistics accumulate in exact integer arithmetic and divide once at
    the end — deterministic IEEE doubles, safe for the cross-engine hash.
    """
    import math

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                k: []
                for k in (
                    "media_id", "kind", "width", "height", "n_units",
                    "mean_a", "mean_b", "mean_c",
                )
            }
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                out["media_id"].append(mid)
                out["kind"].append(kind)
                if kind == "image":
                    w, h, px = decode_bmp(bytes(payload))
                    sums = [0, 0, 0]
                    for i, b in enumerate(px):
                        sums[i % 3] += b
                    n = w * h
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_units"].append(n)
                    out["mean_a"].append(sums[0] / n)
                    out["mean_b"].append(sums[1] / n)
                    out["mean_c"].append(sums[2] / n)
                else:
                    rate, samples = decode_wav(bytes(payload))
                    n = len(samples)
                    s = sum(samples)
                    sq = sum(v * v for v in samples)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["n_units"].append(n)
                    out["mean_a"].append(s / n)
                    out["mean_b"].append(math.sqrt(sq / n))
                    out["mean_c"].append(float(n * 1000 // rate))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, DECODED_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    Features are deterministic byte-level stand-ins for a real encoder:
    size, content hash (md5 of uppercase hex — DuckDB-reproducible since
    DuckDB lacks md5(BLOB)), and 4 scalar features from the first bytes.
    The batch shape (pandas DataFrame with a bytes column per chunk) is
    exactly what a PIL/ffmpeg decoder would consume.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            hexes = [p.hex().upper() if p is not None else None for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "content_hash": [
                        hashlib.md5(h.encode()).hexdigest() if h else None
                        for h in hexes
                    ],
                    **{
                        f"f{i}": [
                            int(h[2 * i : 2 * i + 2], 16) / 255.0 if h else None
                            for h in hexes
                        ]
                        for i in range(4)
                    },
                }
            )

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame offset.

    Real frame extraction (ffmpeg) is stubbed; the explode of frame offsets
    and the per-frame payload slice are the actual distributed work."""
    frames = F.when(
        F.col("kind") == "video",
        # greatest(..., 0): a corrupt/negative duration_ms would make
        # sequence() raise (positive step needs start <= stop) — a dirty
        # metadata row degrades to a single frame at offset 0 instead
        F.expr(f"sequence(0, greatest(meta.duration_ms, 0), {every_ms})"),
    ).otherwise(F.array(F.lit(0)))
    return media.select(
        "media_id",
        "kind",
        F.explode(frames).alias("frame_offset_ms"),
        # stub "frame": an 8-byte slice of the payload keyed by offset
        F.expr("substring(payload, 1 + cast(frame_offset_ms % 24 as int), 8)").alias(
            "frame_bytes"
        ),
    )


RESIZED_SCHEMA = (
    "media_id long, width int, height int, payload binary, px_sum long"
)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL nearest-neighbor resize of BMP payloads (mapInPandas + numpy).

    Decode → (h, w, 3) ndarray in storage order (bottom-up rows; resampling
    in storage order preserves the BMP orientation) → integer index
    sampling src = floor(dst * src_dim / out_dim) → re-encode a valid
    24bpp BMP with fresh headers and row padding. ``px_sum`` (exact BIGINT
    over all resized pixel bytes) lets the oracle verify the resample
    index math from the generative pixel formula without parsing binaries:
    a wrong rounding mode, a transposed axis, or a channel swap all change
    the sum. Non-image rows pass through untouched metadata-wise
    (payload=NULL) so the operator composes with mixed-media tables."""
    import numpy as np
    import struct as _struct

    def _encode(px: "np.ndarray") -> bytes:
        h, w, _ = px.shape
        row_len = w * 3
        pad = (4 - row_len % 4) % 4
        img_size = (row_len + pad) * h
        header = _struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
        info = _struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
        )
        body = bytearray()
        for r in range(h):
            body.extend(px[r].tobytes())
            body.extend(b"\x00" * pad)
        return header + info + bytes(body)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("media_id", "width", "height", "payload", "px_sum")}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image" or payload is None:
                    continue
                try:
                    w, h, px = decode_bmp(bytes(payload))
                    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
                except (ValueError, struct.error):
                    continue  # corrupt payload: skip, don't fail the task
                rows = (np.arange(out_h) * h) // out_h
                cols = (np.arange(out_w) * w) // out_w
                resized = np.ascontiguousarray(arr[rows][:, cols])
                out["media_id"].append(mid)
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["payload"].append(_encode(resized))
                out["px_sum"].append(int(resized.sum(dtype=np.int64)))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, RESIZED_SCHEMA)


SPECTRAL_SCHEMA = (
    "media_id long, n_samples long, sample_sum long, energy_sum long, "
    "total_power double, "
    "band0 double, band1 double, band2 double, band3 double"
)


def audio_spectral(media: DataFrame, n_bands: int = 4) -> DataFrame:
    """Spectral band energies for WAV payloads (mapInPandas + numpy rfft).

    Per audio row: magnitude-squared spectrum |rfft(x)|², grouped into
    ``n_bands`` equal frequency bands (DC excluded), each normalized by n
    so Parseval holds: Σ bands ≈ mean(x²) - mean(x)² (the DC term carries
    the mean). The real DSP path a feature extractor would run before an
    audio encoder — deterministic, so it's agreement-tested against the
    closed-form tone spectrum in tests (not just numpy-vs-numpy)."""
    import numpy as np

    if n_bands != 4:
        raise ValueError("schema is fixed at 4 bands")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                k: []
                for k in (
                    "media_id", "n_samples", "sample_sum", "energy_sum",
                    "total_power", "band0", "band1", "band2", "band3",
                )
            }
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "audio" or payload is None:
                    continue
                try:
                    _rate, samples = decode_wav(bytes(payload))
                except (ValueError, struct.error):
                    continue  # corrupt payload: skip, don't fail the task
                x = np.asarray(samples, dtype=np.float64)
                n = len(x)
                if n == 0:
                    continue
                spec = np.abs(np.fft.rfft(x)) ** 2 / (n * n)
                # double the positive-frequency bins (conjugate symmetry),
                # except DC and (for even n) Nyquist
                spec[1 : (n + 1) // 2] *= 2.0
                ac = spec[1:]  # drop DC: band energies of the AC signal
                bounds = [
                    (len(ac) * b) // n_bands for b in range(n_bands + 1)
                ]
                bands = [
                    float(ac[bounds[b] : bounds[b + 1]].sum())
                    for b in range(n_bands)
                ]
                out["media_id"].append(mid)
                out["n_samples"].append(n)
                # exact integer time-domain sums (PCM16 values, so the sums
                # are exact BIGINTs any engine reproduces bit-for-bit from
                # the generative formula) — the oracle-checkable side of the
                # Parseval identity the FFT bands must satisfy
                out["sample_sum"].append(int(sum(samples)))
                out["energy_sum"].append(int(sum(v * v for v in samples)))
                out["total_power"].append(float(ac.sum()))
                for b in range(n_bands):
                    out[f"band{b}"].append(bands[b])
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, SPECTRAL_SCHEMA)
