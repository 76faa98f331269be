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
    media = F.struct(
        F.lit(kind).alias("kind"),
        F.lit("image/jpeg" if kind == "image" else "video/mp4").alias("mime"),
        width.alias("width"),
        height.alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"),
        (n_frames if kind == "video" else F.lit(None).cast("int")).alias("n_frames"),
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


@register(
    "mm_image_features",
    None,
    "decode+featurize via Arrow-batched mapInPandas (fake codec; rows-only)",
)
def mm_image_features(spark: SparkSession, sf: str) -> DataFrame:
    imgs = docs_as_media(spark, sf)
    return M.image_features(imgs, fake=True)
