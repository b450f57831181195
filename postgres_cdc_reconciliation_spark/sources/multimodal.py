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
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("media_id")
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


def decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: real image decode needs PIL/libvips, absent in this container."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL; container ships without media libs"
        ) from e


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
        F.expr(f"sequence(0, meta.duration_ms, {every_ms})"),
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
