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


def test_codec_real_raises_without_library():
    """codec='real' demands an imaging lib; this container has none."""
    with pytest.raises(NotImplementedError):
        M.decode_image(b"payload", 4, 4, codec="real")


def test_codec_auto_falls_back_to_synthetic():
    """No imaging lib importable here -> auto == deterministic fake."""
    assert M.decode_image(b"payload", 4, 4) == M._fake_pixels(b"payload", 4, 4)


def test_codec_auto_selects_real_library_when_present(monkeypatch):
    """Feature detection: plant a stub PIL in sys.modules and verify
    the auto path routes decode through it, not the synthetic fake."""
    import sys
    import types

    calls = []

    class _Img:
        def convert(self, mode):
            return self

        def resize(self, wh):
            self._wh = wh
            return self

        def tobytes(self):
            w, h = self._wh
            return b"\xab" * (w * h)

    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")

    def _open(buf):
        calls.append(buf.read())
        return _Img()

    pil_image.open = _open
    pil.Image = pil_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)

    out = M.decode_image(b"payload", 4, 4, codec="auto")
    assert out == b"\xab" * 16
    assert calls == [b"payload"]
    # and synthetic stays pinned regardless of the library
    assert M.decode_image(b"payload", 4, 4, codec="synthetic") == M._fake_pixels(b"payload", 4, 4)


def test_frame_sample(spark):
    vids = M.synthesize_media_df(spark, n=8, kind="video")
    out = M.frame_sample(vids, every_n=8)
    rows = out.collect()
    assert all(r["frame_idx"] % 8 == 0 for r in rows)
    n_frames = {r["media_id"]: r["media"]["n_frames"] for r in vids.collect()}
    import math

    expected = sum(math.ceil(n / 8) for n in n_frames.values())
    assert len(rows) == expected


def test_audio_features_closed_form(spark):
    """Feature math must match a direct computation over the tiled
    digest samples (and filter to audio rows only)."""
    import hashlib
    import math

    import numpy as np

    from icegopher_spark.operators import multimodal as M

    rows = [
        (1, b"hello", ("audio", "audio/wav", None, None, 1000, 8000, None)),
        (2, b"x", ("image", "image/jpeg", 32, 32, None, None, None)),
    ]
    schema = (
        "media_id long, content binary, media struct<kind string, mime string,"
        " width int, height int, duration_ms long, sample_rate int, n_frames int>"
    )
    df = spark.createDataFrame(rows, schema)
    out = M.audio_features(df).collect()
    assert len(out) == 1  # image row filtered out
    r = out[0]
    n = 8000 * 1000 // 1000
    dig = np.frombuffer(hashlib.sha256(b"hello").digest(), dtype=np.uint8).astype(np.int64) - 128
    s = np.tile(dig, n // 32 + 1)[:n]
    assert r.n_samples == n
    assert r.amp_sum == int(s.sum())
    assert r.peak == int(np.abs(s).max())
    assert r.rms == round(math.sqrt(int((s * s).sum()) / n), 6)


def test_null_payloads_do_not_kill_tasks(spark):
    """r8 review wave 5: a NULL binary payload (nullable column) must
    yield NULL/zero features, never a bytes(None) TypeError mid-task;
    width/height of 0 must not silently become 64."""
    from pyspark.sql import functions as F

    from icegopher_spark.operators import multimodal as M

    rows = [
        (1, bytearray(b"img-bytes"), ("image", 8, 8, None, None, None)),
        (2, None, ("image", 8, 8, None, None, None)),
        (3, bytearray(b"zero-dim"), ("image", 0, 8, None, None, None)),
        (4, None, ("audio", None, None, 8000, 1000, None)),
    ]
    schema = (
        "media_id long, content binary, media struct<kind string, "
        "width int, height int, sample_rate int, duration_ms int, n_frames int>"
    )
    df = spark.createDataFrame(rows, schema)
    th = {r["media_id"]: r["thumb"] for r in M.thumbnails(df).collect()}
    assert th[1] is not None and th[2] is None and th[3] is None
    ft = {r["media_id"]: r["features"] for r in M.image_features(df).collect()}
    assert ft[1] is not None and ft[2] is None
    au = {r["media_id"]: r for r in M.audio_features(df).collect()}
    assert au[4]["n_samples"] == 0 and au[4]["rms"] == 0.0


def test_group_centroids_skips_null_embeddings(spark):
    from icegopher_spark.operators import similarity as S

    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("a", None), ("a", [0.0, 1.0]), ("b", None)],
        "label string, embedding array<double>",
    )
    got = {r["label"]: r for r in S.group_centroids(df, "label").collect()}
    assert got["a"]["n_vecs"] == 2 and got["a"]["centroid"] == [0.5, 0.5]
    assert "b" not in got  # all-null group has nothing to average
