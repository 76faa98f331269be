"""Multimodal columns: images/audio/video as opaque ``binary`` columns
with a typed metadata struct, processed by Arrow-batched pandas
functions over ``mapInPandas``.

Spark-side design (all real and tested):
  * The column convention: ``content binary`` + ``media struct<kind,
    mime, width, height, duration_ms, sample_rate, n_frames>`` — the
    pattern that lets a 100 TB corpus keep payloads inline in parquet
    (vectorized IO, column pruning skips payloads when untouched) while
    metadata-only queries never deserialize a byte of media.
  * All transforms are ``mapInPandas`` with an explicit output schema:
    Arrow moves whole batches, pandas does per-batch vector work, and
    the operator composes with partitioning like any narrow map.
  * Batch sizing: payload rows are heavy, so callers should set
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` down (e.g. 64) for
    real media; the functions are agnostic to it.

Codec selection is by FEATURE DETECTION (``codec="auto"``, the
default): a real imaging library (PIL, else imageio) is used when
importable; otherwise the deterministic synthetic decoder (seeded from
the payload hash) stands in — callers never thread a flag. This
container ships no imaging libs, so auto resolves to synthetic here;
``codec="synthetic"`` pins the deterministic decoder explicitly (the
correctness gates do, so their byte-exact oracles hold even where PIL
exists) and ``codec="real"`` demands a real library. The Spark
plumbing — schemas, UDF signatures, batch shapes, partition behavior —
is real and fully exercised either way.

[X] extension surface (SURVEY.md §2.9); no counterpart in the
reference.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def media_schema(id_type: T.DataType = T.LongType()) -> T.StructType:
    return T.StructType(
        [
            T.StructField("media_id", id_type, False),
            T.StructField("content", T.BinaryType()),
            T.StructField("media", MEDIA_STRUCT),
        ]
    )


def synthesize_media_df(spark, n: int = 256, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media corpus (payload = seeded bytes) —
    the stand-in for a real ingest, used by tests and the gate."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{kind}-{i}".encode()).digest() * 8  # 256 B
        if kind == "image":
            meta = (kind, "image/jpeg", 64 + (i % 16) * 32, 64 + (i % 9) * 32, None, None, None)
        elif kind == "audio":
            meta = (kind, "audio/wav", None, None, 1000 + i * 37, 16000, None)
        else:
            meta = (kind, "video/mp4", 640, 360, 2000 + i * 53, None, 24 + i % 8)
        rows.append((i, payload, meta))
    return spark.createDataFrame(rows, media_schema())


# -- codec stubs ------------------------------------------------------------


def _fake_pixels(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic fake decode: stretch a seeded digest to w*h bytes
    (grayscale). Stands in for a JPEG decoder."""
    seed = hashlib.sha256(payload).digest()
    need = w * h
    reps = need // len(seed) + 1
    return (seed * reps)[:need]


def _detect_real_decoder():
    """(name, fn) for the first importable imaging library, or None.
    fn(payload, w, h) -> w*h grayscale bytes."""
    try:
        import io as _io

        from PIL import Image  # type: ignore[import-not-found]

        def _pil(payload: bytes, w: int, h: int) -> bytes:
            img = Image.open(_io.BytesIO(payload)).convert("L").resize((w, h))
            return img.tobytes()

        return "pil", _pil
    except ImportError:
        pass
    try:
        import imageio.v3 as _iio  # type: ignore[import-not-found]
        import numpy as _np

        def _imageio(payload: bytes, w: int, h: int) -> bytes:
            arr = _np.asarray(_iio.imread(payload))
            if arr.ndim == 3:
                arr = arr.mean(axis=2)
            ys = _np.arange(h) * arr.shape[0] // h
            xs = _np.arange(w) * arr.shape[1] // w
            return arr[_np.ix_(ys, xs)].astype("uint8").tobytes()

        return "imageio", _imageio
    except ImportError:
        pass
    return None


def get_image_decoder(codec: str = "auto"):
    """Resolve the decode callable. ``auto``: real library if
    importable, else the deterministic synthetic decoder. ``real``:
    require a library (NotImplementedError when absent — this container
    ships none). ``synthetic``: always the deterministic fake."""
    if codec == "synthetic":
        return _fake_pixels
    real = _detect_real_decoder()
    if codec == "real":
        if real is None:
            raise NotImplementedError(
                "image decode requires an imaging library (PIL or imageio); "
                "none is importable in this environment"
            )
        return real[1]
    if codec != "auto":
        raise ValueError(f"unknown codec {codec!r}")
    return real[1] if real is not None else _fake_pixels


def decode_image(payload: bytes, w: int, h: int, codec: str = "auto") -> bytes:
    return get_image_decoder(codec)(payload, w, h)


# -- operators (mapInPandas; plumbing is real) ------------------------------


def media_stats(df: DataFrame) -> DataFrame:
    """Per-kind media stats. Metadata-only WHEN the media struct
    carries ``n_bytes`` (the payload column prunes out of the scan —
    check .explain ReadSchema); otherwise total_bytes falls back to
    length(content), which necessarily materializes every payload byte
    (r6 review: the old docstring claimed payload pruning
    unconditionally while always reading content). Real multimodal
    schemas stamp the byte size into metadata at ingest for exactly
    this reason."""
    media_fields = df.schema["media"].dataType.fieldNames()
    total = (
        F.sum(F.col("media.n_bytes"))
        if "n_bytes" in media_fields
        else F.sum(F.length("content"))
    )
    return (
        df.groupBy(F.col("media.kind").alias("kind"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            total.alias("total_bytes"),
            F.avg(F.col("media.width")).alias("avg_width"),
        )
    )


def thumbnails(
    df: DataFrame, thumb_w: int = 8, thumb_h: int = 8, codec: str = "auto"
) -> DataFrame:
    """Decode → resize to (thumb_w, thumb_h) grayscale via mapInPandas.

    Output: (media_id, thumb binary, thumb_w, thumb_h). Arrow-batched;
    per-batch python cost is one pass over the payload column. The
    decoder resolves EXECUTOR-side per task (codec='auto' feature-
    detects the imaging lib on the worker, where it actually runs)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("thumb", T.BinaryType()),
            T.StructField("thumb_w", T.IntegerType()),
            T.StructField("thumb_h", T.IntegerType()),
        ]
    )

    df = df.filter(F.col("media.kind") == "image")  # never feed the
    # image decoder audio/video payloads (r6: a real PIL decoder raises
    # UnidentifiedImageError mid-task; the synthetic one emits garbage)

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        decode = get_image_decoder(codec)
        for pdf in batches:
            thumbs = []
            for payload, media in zip(pdf["content"], pdf["media"]):
                if payload is None:
                    # nullable binary: a NULL payload yields a NULL
                    # thumb, never a bytes(None) TypeError killing the
                    # task (r8 review wave 5)
                    thumbs.append(None)
                    continue
                # is-None check, not `or`: a stored width/height of 0
                # must not silently become 64 (same falsy-zero trap
                # audio_features was fixed for in r6)
                w = 64 if media["width"] is None else media["width"]
                h = 64 if media["height"] is None else media["height"]
                if w <= 0 or h <= 0:
                    thumbs.append(None)
                    continue
                px = decode(bytes(payload), int(w), int(h))
                # nearest-neighbor downsample to thumb_w × thumb_h
                tw, th = thumb_w, thumb_h
                t = bytes(
                    px[(y * h // th) * w + (x * w // tw)] for y in range(th) for x in range(tw)
                )
                thumbs.append(t)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "thumb": thumbs,
                    "thumb_w": thumb_w,
                    "thumb_h": thumb_h,
                }
            )

    return df.mapInPandas(gen, out_schema)


def image_features(df: DataFrame, codec: str = "auto") -> DataFrame:
    """Per-image feature vector (mean/std/histogram-ish) as
    array<double> — the decode+featurize stage of a multimodal training
    pipeline. Deterministic under the fake decoder. Double precision so
    4-decimal rounding in the gate matches a float64 SQL oracle exactly
    (float32 is only ~7 significant digits — too coarse to round a
    2-digit std to 4 decimals reliably)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    df = df.filter(F.col("media.kind") == "image")  # see thumbnails

    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        decode = get_image_decoder(codec)
        for pdf in batches:
            feats = []
            for payload, media in zip(pdf["content"], pdf["media"]):
                if payload is None:
                    feats.append(None)  # see thumbnails (r8 wave 5)
                    continue
                w = int(64 if media["width"] is None else media["width"])
                h = int(64 if media["height"] is None else media["height"])
                if w <= 0 or h <= 0:
                    feats.append(None)
                    continue
                px = np.frombuffer(decode(bytes(payload), w, h), dtype=np.uint8)
                hist = np.bincount(px >> 5, minlength=8).astype("float64") / len(px)
                feats.append(
                    [float(px.mean()), float(px.std()), *[float(x) for x in hist]]
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.mapInPandas(gen, out_schema)


def frame_sample(df: DataFrame, every_n: int = 8) -> DataFrame:
    """Video frame sampling plan: emits one row per sampled frame index
    (payload decode stubbed — indices and shapes are the real part)."""
    # guard n_frames <= 0: F.sequence(0, -1) yields a DESCENDING [0,-1]
    # (not empty), so a zero-frame video emitted a phantom frame_idx 0
    # for downstream decoders to chase (r6 review)
    nf = F.coalesce(F.col("media.n_frames"), F.lit(1))
    # stepped sequence, not full-range-then-filter: a 2h/30fps video
    # would materialize 216k indices per row to keep 27k (r8 wave 5);
    # sequence(0, nf-1, step) emits exactly the i % every_n == 0 set
    frames = F.when(
        nf > 0, F.sequence(F.lit(0), nf - 1, F.lit(int(every_n)))
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.filter(F.col("media.kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
    )


def _fake_pcm(payload: bytes, n: int):
    """Deterministic synthetic PCM decode stub: centered int8 samples
    from the payload's sha256 digest, tiled to n samples. A real audio
    decoder (soundfile/librosa) would slot in exactly here — the
    Spark-side plumbing (schema, batching, feature math) is identical."""
    import hashlib

    import numpy as np

    dig = np.frombuffer(hashlib.sha256(payload).digest(), dtype=np.uint8).astype(
        np.int64
    ) - 128
    reps = n // 32 + 1
    return np.tile(dig, reps)[:n]


def audio_features(df: DataFrame) -> DataFrame:
    """Per-clip audio feature extraction via mapInPandas: sample count,
    amplitude sum, RMS, peak — the decode+featurize stage of an audio
    training pipeline. n_samples = sample_rate · duration_ms / 1000
    (integer arithmetic). RMS is computed as sqrt(integer-exact sum of
    squares / n): one IEEE division + sqrt, so the value reproduces
    bit-for-bit in any engine.

    Scale posture: one Python pass per Arrow batch; the payload column
    streams through executors and nothing but the 4-value feature rows
    shuffles."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("amp_sum", T.LongType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("peak", T.LongType()),
        ]
    )

    def gen(batches: Iterator) -> Iterator:
        import math

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload, media in zip(pdf["media_id"], pdf["content"], pdf["media"]):
                # `x or default` would swallow a legitimate 0 (falsy)
                sr = int(8000 if media["sample_rate"] is None else media["sample_rate"])
                dur = int(1000 if media["duration_ms"] is None else media["duration_ms"])
                n = max(sr * dur // 1000, 0)
                if n == 0 or payload is None:
                    # sub-millisecond clip OR NULL payload: zero
                    # samples, not a ZeroDivisionError / bytes(None)
                    # TypeError mid-task (r6 review; r8 wave 5)
                    rows.append((int(mid), 0, 0, 0.0, 0))
                    continue
                s = _fake_pcm(bytes(payload), n)
                sumsq = int((s * s).sum())
                rows.append(
                    (
                        int(mid),
                        n,
                        int(s.sum()),
                        round(math.sqrt(sumsq / n), 6),
                        int(np.abs(s).max()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "amp_sum", "rms", "peak"]
            )

    return df.filter(F.col("media.kind") == "audio").mapInPandas(gen, out_schema)
