"""[EXT] Multimodal pipeline queries — binary columns through mapInPandas.

The Spark side runs the REAL Arrow plumbing (binary payloads through
mapInPandas); the oracle recomputes the same deterministic features in pure
SQL from the generating hex strings. Equality proves schema, batch shape,
and per-byte feature math survive the Python boundary intact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import register

_MEDIA_CTE = """
media AS (
  SELECT CAST(o_orderkey AS BIGINT) AS media_id,
         CASE WHEN o_orderkey % 3 = 0 THEN 'image'
              WHEN o_orderkey % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         upper(md5(CAST(o_orderkey AS VARCHAR))
               || md5(CAST(o_orderkey AS VARCHAR) || 'x')) AS hex64
  FROM orders
)"""


@register(
    "q_multimodal_features",
    f"""WITH {_MEDIA_CTE}
SELECT media_id, kind,
       CAST(octet_length(unhex(hex64)) AS BIGINT) AS n_bytes,
       md5(hex64) AS content_hash,
       CAST('0x' || substr(hex64, 1, 2) AS INTEGER) / 255.0 AS f0,
       CAST('0x' || substr(hex64, 3, 2) AS INTEGER) / 255.0 AS f1,
       CAST('0x' || substr(hex64, 5, 2) AS INTEGER) / 255.0 AS f2,
       CAST('0x' || substr(hex64, 7, 2) AS INTEGER) / 255.0 AS f3
FROM media""",
    doc="[EXT] binary media columns → Arrow-batched mapInPandas feature extraction (decode stubbed; plumbing real)",
)
def q_multimodal_features(spark, sf_dir):
    from ..sources.multimodal import extract_features, synth_media

    return extract_features(synth_media(spark, sf_dir))


@register(
    "q_frame_sample",
    f"""WITH {_MEDIA_CTE},
m2 AS (
  SELECT media_id, kind, CAST(media_id % 60000 AS INTEGER) AS duration_ms
  FROM media
)
SELECT media_id, kind, unnest(
         CASE WHEN kind = 'video'
              THEN range(0, duration_ms + 1, 10000)
              ELSE [0] END) AS frame_offset_ms
FROM m2""",
    doc="[EXT] video frame-sampling plumbing: per-frame row explode (ffmpeg decode stubbed)",
)
def q_frame_sample(spark, sf_dir):
    from ..sources.multimodal import sample_frames, synth_media

    return sample_frames(synth_media(spark, sf_dir), every_ms=10000).select(
        "media_id", "kind", F.col("frame_offset_ms").cast("long")
    )
