"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so the bytes never round-trip through the driver
and each executor processes whole record batches.

The decode kernels themselves depend on codec libraries (PIL/ffmpeg/…)
that are NOT in this container: ``decode_fn`` defaults to a
deterministic fake (shape/byte stats) and raises ``NotImplementedError``
when a real decode is requested. The Spark-side plumbing — schema,
batch iteration, partition sizing, output contract — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from contextlib import contextmanager

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("content_sha1", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def fake_decode_features(content: bytes | None, dim: int = 8) -> list[float] | None:
    """Deterministic stand-in for a real decode→embed kernel: sha1-seeded
    byte statistics. Replace with a real model via ``extract_features``'s
    ``feature_fn`` once codec/model libs exist in the image."""
    if content is None:
        return None
    digest = hashlib.sha1(content).digest()
    return [b / 255.0 for b in digest[:dim]]


def real_decode(content: bytes, mime: str):
    """Decode bytes with the soft-imported codec library: PIL when it is
    installed (any image/* mime), otherwise raises — audio/video decode
    (av/ffmpeg) stays a deployment concern either way."""
    if mime and mime.startswith("image/"):
        try:
            import io

            from PIL import Image
        except ImportError as exc:  # pragma: no cover - env without PIL
            raise NotImplementedError(
                "image decode requires Pillow, which is not installed in "
                "this image; pip install pillow on a full deployment"
            ) from exc
        img = Image.open(io.BytesIO(content))
        img.load()
        return img
    raise NotImplementedError(
        f"no decode kernel for mime={mime!r} in this deployment "
        "(audio/video need av/ffmpeg; wire them here)"
    )


def build_image_feature_fn(
    dim: int = 8,
) -> Callable[[bytes | None], list[float] | None]:
    """Deploy-ready kernel selection: the real PIL-backed decode→feature
    kernel when Pillow is importable, else the deterministic fake — so
    the same pipeline code ships unchanged from this codec-less sandbox
    to a full image. The real kernel emits a small deterministic
    signature (normalized dimensions, mode-channel count, grayscale
    mean/extremes of a fixed 8×8 downsample) — stand-in features with
    the shape/determinism of an embedding, swappable for a model."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return lambda content: fake_decode_features(content, dim)

    def decode_features(content: bytes | None) -> list[float] | None:
        if content is None:
            return None
        try:
            img = Image.open(io.BytesIO(content))
            small = img.convert("L").resize((8, 8))
            px = list(small.getdata())
            feats = [
                min(img.width / 4096.0, 1.0),
                min(img.height / 4096.0, 1.0),
                len(img.getbands()) / 4.0,
                sum(px) / (len(px) * 255.0),
                min(px) / 255.0,
                max(px) / 255.0,
            ]
        except Exception:
            # undecodable bytes degrade to the deterministic fake rather
            # than failing the whole batch
            return fake_decode_features(content, dim)
        return (feats + [0.0] * dim)[:dim]

    return decode_features


_ARROW_BATCH_KEY = "spark.sql.execution.arrow.maxRecordsPerBatch"


@contextmanager
def arrow_batch_bound(spark, batch_rows: int):
    """Bound Arrow batch rows for actions run inside the block, restoring
    the session conf on exit.

    The conf is read at ACTION time, not plan-build time (verified:
    a mapInPandas built under batch=7 but collected under batch=10000
    sees 10000-row batches) — so the bound must wrap the
    write/collect/count that materializes the stage, and a set-and-forget
    inside the operator builder would both leak the conf session-wide and
    fail to guarantee the bound for later actions.
    """
    prev = spark.conf.get(_ARROW_BATCH_KEY, None)
    spark.conf.set(_ARROW_BATCH_KEY, str(batch_rows))
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_ARROW_BATCH_KEY)
        else:
            spark.conf.set(_ARROW_BATCH_KEY, prev)


def extract_features(
    media: DataFrame,
    feature_fn: Callable[[bytes | None], list[float] | None] = fake_decode_features,
    batch_rows: int | None = None,
) -> DataFrame:
    """binary column → feature vectors, Arrow-batched.

    ``batch_rows`` bounds the rows (hence bytes) per pandas batch — media
    blobs are large, and default 10k-row Arrow batches would OOM an
    executor at real blob sizes. Because the conf is read when the stage
    RUNS, passing ``batch_rows`` here sets it for the session (documented
    side effect for one-shot pipelines); callers that need scoping should
    pass None and wrap their action in ``arrow_batch_bound`` instead.
    """
    if batch_rows is not None:
        media.sparkSession.conf.set(_ARROW_BATCH_KEY, str(batch_rows))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [feature_fn(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(c) if c is not None else None for c in pdf["content"]],
                    "content_sha1": [
                        hashlib.sha1(c).hexdigest() if c is not None else None
                        for c in pdf["content"]
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled timestamp
    (explode over the sampling grid); the actual frame decode is the
    stubbed kernel. Demonstrates the fan-out contract."""
    from pyspark.sql import functions as F

    n_frames = F.least(
        F.floor(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms) + 1,
        F.lit(max_frames),
    ).cast("int")
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)


def chunk_audio(
    media: DataFrame,
    window_ms: int = 1000,
    hop_ms: int = 500,
    max_chunks: int = 256,
) -> DataFrame:
    """Audio chunking plan — the waveform twin of :func:`sample_frames`:
    one row per analysis window ``[i*hop, min(i*hop + window, dur))``
    for every ``i`` with ``i*hop < duration_ms``, capped at
    ``max_chunks``. Zero/NULL durations produce zero rows (a media row
    with no duration has nothing to chunk — callers wanting a sentinel
    row can left-join back).

    Pure integer plan math over the metadata struct (the actual PCM
    decode is the stubbed kernel, like every codec in this image) — so
    the fan-out contract itself is exactly testable: chunk count,
    boundaries, and the cap are all deterministic arithmetic.
    """
    from pyspark.sql import functions as F

    if window_ms < 1 or hop_ms < 1:
        raise ValueError("chunk_audio: window_ms and hop_ms must be >= 1")
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0)).cast("long")
    n_chunks = F.least(
        F.expr(
            f"(CAST(coalesce(meta.duration_ms, 0) AS BIGINT)"
            f" + {hop_ms} - 1) div {hop_ms}"
        ),
        F.lit(int(max_chunks)).cast("long"),
    )
    out = media.select(
        "media_id",
        dur.alias("_dur"),
        n_chunks.alias("_n"),
    ).filter(F.col("_n") > 0)
    return (
        out.select(
            "media_id",
            "_dur",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("_n") - 1)).alias(
                "chunk_idx"
            ),
        )
        .withColumn("start_ms", F.col("chunk_idx") * hop_ms)
        .withColumn(
            "end_ms", F.least(F.col("start_ms") + window_ms, F.col("_dur"))
        )
        .drop("_dur")
    )
