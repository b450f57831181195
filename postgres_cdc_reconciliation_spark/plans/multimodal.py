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
    """WITH media AS (
  SELECT CAST(o_orderkey AS BIGINT) AS media_id,
         CASE WHEN o_orderkey % 3 = 0 THEN 'image' ELSE 'audio' END AS kind
  FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 3 != 2
),
img AS (SELECT media_id, 8 + media_id % 8 AS w, 4 + media_id % 4 AS h
        FROM media WHERE kind = 'image'),
img_ex AS (SELECT media_id, w, h, unnest(range(0, w*h*3)) AS k FROM img),
img_stats AS (
  SELECT media_id, w, h,
         CAST(SUM(CASE WHEN k % 3 = 0 THEN (media_id*7 + k) % 256 END) AS BIGINT) AS sb,
         CAST(SUM(CASE WHEN k % 3 = 1 THEN (media_id*7 + k) % 256 END) AS BIGINT) AS sg,
         CAST(SUM(CASE WHEN k % 3 = 2 THEN (media_id*7 + k) % 256 END) AS BIGINT) AS sr
  FROM img_ex GROUP BY media_id, w, h
),
aud AS (SELECT media_id, 64 + media_id % 64 AS n FROM media WHERE kind = 'audio'),
aud_ex AS (SELECT media_id, n, unnest(range(0, n)) AS k FROM aud),
aud_stats AS (
  SELECT media_id, n,
         CAST(SUM(((media_id*31 + k*17) % 65536) - 32768) AS BIGINT) AS s,
         CAST(SUM((((media_id*31 + k*17) % 65536) - 32768)
                * (((media_id*31 + k*17) % 65536) - 32768)) AS BIGINT) AS sq
  FROM aud_ex GROUP BY media_id, n
)
SELECT media_id, 'image' AS kind,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(w*h AS BIGINT) AS n_units,
       CAST(sb AS DOUBLE) / (w*h) AS mean_a,
       CAST(sg AS DOUBLE) / (w*h) AS mean_b,
       CAST(sr AS DOUBLE) / (w*h) AS mean_c
FROM img_stats
UNION ALL
SELECT media_id, 'audio',
       CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
       CAST(n AS BIGINT),
       CAST(s AS DOUBLE) / n,
       sqrt(CAST(sq AS DOUBLE) / n),
       CAST(n*1000 // 8000 AS DOUBLE)
FROM aud_stats""",
    doc="[EXT] REAL media decode: spec-compliant BMP/WAV payloads parsed by "
    "pure-stdlib struct codecs inside mapInPandas; the oracle recomputes "
    "pixel/sample statistics from the generative formula, so header-offset, "
    "row-padding, or chunk-walk bugs in the decoder fail the hash",
)
def q_multimodal_features(spark, sf_dir):
    from ..sources.multimodal import decode_features, synth_media_real

    return decode_features(synth_media_real(spark, sf_dir, every=10))


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


@register(
    "q_image_resize",
    """WITH img AS (
  SELECT CAST(o_orderkey AS BIGINT) AS media_id,
         8 + o_orderkey % 8 AS w, 4 + o_orderkey % 4 AS h
  FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 3 = 0
),
ex AS (SELECT media_id, w, h, unnest(range(0, 4*3*3)) AS kp FROM img),
mapped AS (
  SELECT media_id,
         ((kp // 12) * h // 3) * (w*3) + (((kp // 3) % 4) * w // 4) * 3
           + kp % 3 AS k
  FROM ex
)
SELECT media_id,
       CAST(4 AS INTEGER) AS width, CAST(3 AS INTEGER) AS height,
       CAST(SUM((media_id*7 + k) % 256) AS BIGINT) AS px_sum
FROM mapped GROUP BY media_id""",
    doc="[EXT] REAL nearest-neighbor image resize (mapInPandas + numpy "
    "index sampling, re-encoded as valid BMPs): the oracle recomputes the "
    "resized pixel sum from the generative formula through the SAME "
    "floor-index resample map (src = dst*src_dim//out_dim), so a wrong "
    "rounding mode, transposed axis, channel swap, or padding slip in the "
    "decode-resize-encode chain fails the hash. Map-only: zero shuffle.",
)
def q_image_resize(spark, sf_dir):
    from ..sources.multimodal import resize_images, synth_media_real

    return resize_images(
        synth_media_real(spark, sf_dir, every=10), out_w=4, out_h=3
    ).select("media_id", "width", "height", "px_sum")


@register(
    "q_audio_spectral",
    """WITH ids AS (
  SELECT CAST(o_orderkey AS BIGINT) AS media_id,
         CAST(64 + o_orderkey % 64 AS BIGINT) AS n
  FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 3 = 1),
samp AS (
  SELECT media_id, n,
         ((media_id * 31 + unnest(range(0, n)) * 17) % 65536) - 32768 AS v
  FROM ids)
SELECT media_id, any_value(n) AS n_samples,
       CAST(sum(v) AS BIGINT) AS sample_sum,
       CAST(sum(v * v) AS BIGINT) AS energy_sum,
       TRUE AS parseval_ok, TRUE AS bands_ok
FROM samp GROUP BY media_id""",
    doc="[EXT] audio spectral band energies (mapInPandas + numpy rfft over "
    "decoded PCM16), oracle-able by construction (VERDICT r4 #3): the WAV "
    "samples are generative (s_k = ((id*31+k*17) %% 65536) - 32768), so "
    "the oracle recomputes the exact integer time-domain sums (Σs, Σs²) "
    "the decoder must reproduce — a decoder misreading the data chunk "
    "fails those BIGINTs — while the FFT side is pinned by in-plan "
    "invariant booleans: parseval_ok (Σ band energies = time-domain "
    "variance from those same exact sums, rel err ≤ 1e-9) and bands_ok "
    "(all bands ≥ 0 and they sum to total_power). A wrong normalization, "
    "dropped conjugate-symmetry doubling, or band-boundary slip flips "
    "parseval_ok/bands_ok; pure-tone band placement stays "
    "pytest-verified (test_multimodal_resize_spectral).",
)
def q_audio_spectral(spark, sf_dir):
    from ..sources.multimodal import audio_spectral, synth_media_real

    sp = audio_spectral(synth_media_real(spark, sf_dir, every=10))
    n = F.col("n_samples").cast("double")
    # population variance from the exact integer sums: E[s²] - E[s]²
    time_var = F.col("energy_sum") / n - (F.col("sample_sum") / n) * (
        F.col("sample_sum") / n
    )
    band_sum = (
        F.col("band0") + F.col("band1") + F.col("band2") + F.col("band3")
    )
    return sp.select(
        "media_id",
        "n_samples",
        "sample_sum",
        "energy_sum",
        (
            F.abs(F.col("total_power") - time_var)
            <= F.lit(1e-9) * (time_var + F.lit(1.0))
        ).alias("parseval_ok"),
        (
            (F.col("band0") >= 0)
            & (F.col("band1") >= 0)
            & (F.col("band2") >= 0)
            & (F.col("band3") >= 0)
            & (
                F.abs(band_sum - F.col("total_power"))
                <= F.lit(1e-9) * (F.col("total_power") + F.lit(1.0))
            )
        ).alias("bands_ok"),
    )
