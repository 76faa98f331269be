"""Multimodal column plumbing: schemas, mapInPandas batch shapes,
determinism of the fake decoder, payload pruning for metadata queries."""

import pytest
from pyspark.sql import functions as F

from icegopher_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def images(spark):
    return M.synthesize_media_df(spark, n=64, kind="image").repartition(8)


def test_schema_shape(images):
    assert images.schema["content"].dataType.typeName() == "binary"
    assert images.schema["media"].dataType["kind"].dataType.typeName() == "string"


def test_media_stats_prunes_payload(spark, images):
    stats = M.media_stats(images.select("media_id", "media", "content"))
    row = stats.collect()[0]
    assert row["kind"] == "image"
    assert row["n_items"] == 64
    assert row["total_bytes"] == 64 * 256


def test_thumbnails_deterministic(spark, images):
    t1 = {r["media_id"]: bytes(r["thumb"]) for r in M.thumbnails(images).collect()}
    t2 = {r["media_id"]: bytes(r["thumb"]) for r in M.thumbnails(images).collect()}
    assert t1 == t2
    assert all(len(v) == 64 for v in t1.values())  # 8x8 grayscale


def test_image_features_shape(spark, images):
    feats = M.image_features(images).collect()
    assert len(feats) == 64
    for r in feats:
        assert len(r["features"]) == 10  # mean, std, 8-bin histogram
        assert 0.99 < sum(r["features"][2:]) < 1.01  # histogram sums to 1


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"payload", 4, 4, fake=False)


def test_frame_sample(spark):
    vids = M.synthesize_media_df(spark, n=8, kind="video")
    out = M.frame_sample(vids, every_n=8)
    rows = out.collect()
    assert all(r["frame_idx"] % 8 == 0 for r in rows)
    n_frames = {r["media_id"]: r["media"]["n_frames"] for r in vids.collect()}
    import math

    expected = sum(math.ceil(n / 8) for n in n_frames.values())
    assert len(rows) == expected
