"""Multimodal gate queries: the media corpus is derived
deterministically from the documents table (payload = UTF-8 bytes of
text, metadata from doc_id), so DuckDB can compute the oracle from the
same parquet — which checks the binary-column plumbing, not just a
synthetic fixture."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import multimodal as M
from .queries import load, register


def docs_as_media(spark: SparkSession, sf_dir: str, kind: str = "image") -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    width = (F.lit(32) + (F.col("doc_id") % 16) * 16).cast("int")
    height = (F.lit(32) + (F.col("doc_id") % 9) * 16).cast("int")
    n_frames = (F.lit(24) + F.col("doc_id") % 8).cast("int")
    is_av = kind == "audio"
    mime = {"image": "image/jpeg", "video": "video/mp4", "audio": "audio/wav"}[kind]
    media = F.struct(
        F.lit(kind).alias("kind"),
        F.lit(mime).alias("mime"),
        (F.lit(None).cast("int") if is_av else width).alias("width"),
        (F.lit(None).cast("int") if is_av else height).alias("height"),
        (
            (F.lit(500) + (F.col("doc_id") % 100) * 10).cast("long")
            if is_av
            else F.lit(None).cast("long")
        ).alias("duration_ms"),
        (
            (F.lit(8000) + (F.col("doc_id") % 4) * 4000).cast("int")
            if is_av
            else F.lit(None).cast("int")
        ).alias("sample_rate"),
        (n_frames if kind == "video" else F.lit(None).cast("int")).alias("n_frames"),
        # byte size stamped into metadata at "ingest" — media_stats
        # reads THIS, never the payload column (r6)
        F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
        media.alias("media"),
    )


mm_stats_oracle = """
SELECT 'image' AS kind, COUNT(*) AS n_items,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       ROUND(AVG(32 + (doc_id % 16) * 16), 4) AS avg_width
FROM documents
"""


@register(
    "mm_media_stats",
    mm_stats_oracle,
    "metadata-only media stats (payload column pruned from the scan)",
)
def mm_media_stats(spark: SparkSession, sf: str) -> DataFrame:
    stats = M.media_stats(docs_as_media(spark, sf))
    return stats.select(
        "kind", "n_items", "total_bytes", F.round("avg_width", 4).alias("avg_width")
    )


mm_frames_oracle = """
SELECT doc_id AS media_id, UNNEST(range(0, 24 + doc_id % 8, 8)) AS frame_idx
FROM documents
"""


@register(
    "mm_frame_sample",
    mm_frames_oracle,
    "video frame-sampling plan: one row per sampled frame index",
)
def mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    vids = docs_as_media(spark, sf, kind="video")
    return M.frame_sample(vids, every_n=8).select(
        "media_id", F.col("frame_idx").cast("long").alias("frame_idx")
    )


# Thumbnail oracle: the fake decoder's pixel array is the 32-byte
# digest repeated (w*h is a multiple of 32), so the nearest-neighbor
# thumbnail pixel at (x, y) is digest[((y*h//8)*w + x*(w//8)) % 32] —
# every index is computable from doc_id alone, and the digest bytes
# come from sha256(text) hex, so DuckDB rebuilds each 8×8 thumbnail
# byte-for-byte.
mm_thumb_oracle = """
WITH d AS (
  SELECT doc_id AS media_id, lower(sha256(text)) AS hx,
         32 + (doc_id % 16) * 16 AS w, 32 + (doc_id % 9) * 16 AS h
  FROM documents
), px AS (
  SELECT media_id, i.i AS i,
         (strpos('0123456789abcdef',
                 substr(hx, 2*((((i.i // 8) * h // 8) * w + (i.i % 8) * (w // 8)) % 32) + 1, 1)) - 1) * 16
       + (strpos('0123456789abcdef',
                 substr(hx, 2*((((i.i // 8) * h // 8) * w + (i.i % 8) * (w // 8)) % 32) + 2, 1)) - 1)
           AS b
  FROM d CROSS JOIN range(0, 64) i(i)
)
SELECT media_id,
       CAST(SUM(b) AS BIGINT) AS thumb_sum,
       CAST(MIN(CASE WHEN i = 0 THEN b END) AS BIGINT) AS first_px,
       CAST(MIN(CASE WHEN i = 63 THEN b END) AS BIGINT) AS last_px
FROM px GROUP BY media_id
"""


@register(
    "mm_thumbnails",
    mm_thumb_oracle,
    "decode+resize thumbnails via mapInPandas, byte-digest columns",
)
def mm_thumbnails(spark: SparkSession, sf: str) -> DataFrame:
    """8×8 thumbnail digest (sum + corner pixels) computed JVM-side
    from the binary thumb column via hex-nibble arithmetic — scalar,
    sortable, and independently recomputed by the oracle."""
    imgs = docs_as_media(spark, sf)
    th = M.thumbnails(imgs, thumb_w=8, thumb_h=8, codec="synthetic")
    hexc = F.hex("thumb")
    bs = [
        (
            F.conv(F.substring(hexc, 2 * i + 1, 2), 16, 10).cast("bigint")
        )
        for i in range(64)
    ]
    total = bs[0]
    for b in bs[1:]:
        total = total + b
    return th.select(
        "media_id",
        total.alias("thumb_sum"),
        bs[0].alias("first_px"),
        bs[63].alias("last_px"),
    )


# The fake decoder stretches sha256(payload) to w*h bytes; w and h are
# both multiples of 16, so w*h is a multiple of 32 and the stretched
# array is EXACT repeats of the 32-byte digest — mean/std/histogram over
# the image equal those over the digest bytes, which DuckDB can compute
# from sha256(text) (VARCHAR sha256 hashes the UTF-8 bytes = payload).
mm_feats_oracle = """
WITH d AS (
  SELECT doc_id AS media_id, lower(sha256(text)) AS hx FROM documents
), b AS (
  SELECT media_id,
         (strpos('0123456789abcdef', substr(hx, 2*i.i+1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(hx, 2*i.i+2, 1)) - 1) AS v
  FROM d CROSS JOIN range(0, 32) i(i)
)
SELECT media_id,
       ROUND(AVG(v), 4) AS mean_px,
       ROUND(sqrt(AVG(v*v) - AVG(v)*AVG(v)), 4) AS std_px,
       ROUND(SUM(CASE WHEN v // 32 = 0 THEN 1 ELSE 0 END) / 32.0, 4) AS h0,
       ROUND(SUM(CASE WHEN v // 32 = 1 THEN 1 ELSE 0 END) / 32.0, 4) AS h1,
       ROUND(SUM(CASE WHEN v // 32 = 2 THEN 1 ELSE 0 END) / 32.0, 4) AS h2,
       ROUND(SUM(CASE WHEN v // 32 = 3 THEN 1 ELSE 0 END) / 32.0, 4) AS h3,
       ROUND(SUM(CASE WHEN v // 32 = 4 THEN 1 ELSE 0 END) / 32.0, 4) AS h4,
       ROUND(SUM(CASE WHEN v // 32 = 5 THEN 1 ELSE 0 END) / 32.0, 4) AS h5,
       ROUND(SUM(CASE WHEN v // 32 = 6 THEN 1 ELSE 0 END) / 32.0, 4) AS h6,
       ROUND(SUM(CASE WHEN v // 32 = 7 THEN 1 ELSE 0 END) / 32.0, 4) AS h7
FROM b GROUP BY media_id
"""


@register(
    "mm_image_features",
    mm_feats_oracle,
    "decode+featurize via Arrow-batched mapInPandas, scalar digest columns",
)
def mm_image_features(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar projection of the feature vector (mean, std, 8 histogram
    bins) — list-typed cells break the driver's canonicalizer (round-2
    err) and are not SQL-expressible; scalars are both."""
    imgs = docs_as_media(spark, sf)
    feats = M.image_features(imgs, codec="synthetic")
    f = F.col("features")
    return feats.select(
        "media_id",
        F.round(f[0], 4).alias("mean_px"),
        F.round(f[1], 4).alias("std_px"),
        *[F.round(f[i + 2], 4).alias(f"h{i}") for i in range(8)],
    )


# Audio oracle: the PCM stub tiles sha256(payload) bytes (centered at
# -128..127), so every feature is a closed form over the 32 digest
# bytes with per-byte repeat counts n//32 (+1 for the first n%32):
# integer-exact sums, then ONE division + sqrt for RMS.
mm_audio_oracle = """
WITH d AS (
  SELECT doc_id AS media_id, lower(sha256(text)) AS hx,
         ((8000 + (doc_id % 4) * 4000) * (500 + (doc_id % 100) * 10)) // 1000 AS n
  FROM documents
), b AS (
  SELECT media_id, n, i.i AS i,
         (strpos('0123456789abcdef', substr(hx, 2*i.i + 1, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(hx, 2*i.i + 2, 1)) - 1) - 128 AS amp,
         n // 32 + CASE WHEN i.i < n % 32 THEN 1 ELSE 0 END AS cnt
  FROM d CROSS JOIN range(0, 32) i(i)
)
SELECT media_id,
       CAST(MIN(n) AS BIGINT) AS n_samples,
       CAST(SUM(amp * cnt) AS BIGINT) AS amp_sum,
       ROUND(SQRT(CAST(SUM(amp * amp * cnt) AS DOUBLE) / MIN(n)), 6) AS rms,
       CAST(MAX(ABS(amp)) AS BIGINT) AS peak
FROM b GROUP BY media_id
"""


@register(
    "mm_audio_features",
    mm_audio_oracle,
    "audio decode (stub) + feature extraction: n_samples/amp_sum/rms/peak",
)
def mm_audio_features(spark: SparkSession, sf: str) -> DataFrame:
    """Audio branch of the multimodal pipeline: deterministic PCM stub
    (real decoder slots into operators/multimodal.py:_fake_pcm), feature
    math over the tiled samples in one mapInPandas pass. The oracle
    rebuilds every feature from the digest bytes in closed form —
    byte-exact integers, bit-exact RMS."""
    audio = docs_as_media(spark, sf, kind="audio")
    return M.audio_features(audio)
