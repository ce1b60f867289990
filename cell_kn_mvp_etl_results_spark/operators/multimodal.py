"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (``decode_image`` raises NotImplementedError
unless ``fake=True``) because codec libraries are not available in this
environment -- but everything Spark-side is real and tested: the schema
contract, the batch iteration shape, partition sizing, and the
deterministic fake decoder used by tests.

Scale notes: binary payloads ride in parquet; ``mapInPandas`` streams
Arrow record batches so a 100 MB image row never materializes the whole
partition; repartition by size-class before heavy decode to balance
executor work (payload bytes, not row count, is the unit of work).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_luma", LongType(), True),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, int]:
    """Decode an image payload -> (width, height, mean_luma).

    STUB: real decoding needs an image codec library not present in this
    container. ``fake=True`` derives deterministic pseudo-dimensions from
    the payload bytes so the distributed plumbing is testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires a codec library; run with fake=True "
            "for deterministic plumbing tests"
        )
    n = len(payload)
    w = 16 + (payload[0] if n else 0)
    h = 16 + (payload[-1] if n else 0)
    luma = sum(payload[:64]) // max(1, min(n, 64))
    return w, h, luma


def image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Feature-extract image rows via mapInPandas (Arrow batches).

    The UDF contract: batches in, batches out, schema fixed up front --
    the executor never sees Python row objects, only Arrow buffers.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf[pdf["kind"] == "image"]
            rows = []
            for mid, payload in zip(img["media_id"], img["payload"]):
                data = bytes(payload) if payload is not None else b""
                w, h, luma = decode_image(data, fake=fake)
                rows.append((mid, len(data), w, h, luma))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "width", "height", "mean_luma"]
            )

    return media.mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("est_duration_ms", LongType(), True),
        StructField("rms_level", LongType(), True),
    ]
)


def decode_audio(payload: bytes, fake: bool = False) -> tuple[int, int]:
    """Decode an audio payload -> (duration_ms, rms_level). STUB: real
    decoding needs an audio codec library; ``fake=True`` derives
    deterministic pseudo-features so the plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            "audio decoding requires a codec library; run with fake=True "
            "for deterministic plumbing tests"
        )
    n = len(payload)
    duration_ms = n // 16  # pretend 16 bytes/ms
    rms = (sum(b * b for b in payload[:256]) // max(1, min(n, 256))) % 1000
    return duration_ms, rms


def audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Audio feature extraction via mapInPandas (same Arrow-batch
    contract as image_features)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            aud = pdf[pdf["kind"] == "audio"]
            rows = []
            for mid, payload in zip(aud["media_id"], aud["payload"]):
                data = bytes(payload) if payload is not None else b""
                dur, rms = decode_audio(data, fake=fake)
                rows.append((mid, len(data), dur, rms))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "est_duration_ms", "rms_level"]
            )

    return media.mapInPandas(extract, AUDIO_FEATURES_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Cheap metadata without decoding: byte length + content hash.
    Stays fully JVM-side (no Python), so it runs at scan speed."""
    return media.select(
        "media_id",
        "kind",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("content_hash"),
    )


def read_media_dir(spark, path: str, kind: str = "image") -> DataFrame:
    """Ingest raw media files as opaque binary rows via Spark's
    binaryFile source -- (media_id, kind, payload, mime). The media_id
    is a stable hash of the file path; mime is inferred from the
    extension. At 100 TB the same call reads an object-store prefix;
    payload bytes stream through Arrow without driver materialization.
    """
    raw = spark.read.format("binaryFile").load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mime = (
        F.when(ext.isin("png"), "image/png")
        .when(ext.isin("jpg", "jpeg"), "image/jpeg")
        .when(ext.isin("wav"), "audio/wav")
        .when(ext.isin("mp4"), "video/mp4")
        .otherwise(F.concat(F.lit("application/"), ext))
    )
    return raw.select(
        F.conv(F.substring(F.md5(F.col("path")), 1, 14), 16, 10)
        .cast("long")
        .alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content").alias("payload"),
        mime.alias("mime"),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan* scaffold: explodes a frame-index
    array per video row (decode stubbed). Demonstrates the fan-out
    shape: one row per sampled frame, payload carried by reference.
    """
    return (
        media.filter(F.col("kind") == "video")
        .withColumn("n_frames_est", (F.length("payload") / 1000).cast("int"))
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.greatest(F.col("n_frames_est") - 1, F.lit(0)), F.lit(every_n))),
        )
        .select("media_id", "frame_idx")
    )


def repartition_for_decode(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_partitions: int = 200,
    heavy_bytes: int = 32 * 1024 * 1024,
) -> DataFrame:
    """Balance DECODE work (payload bytes, not rows) across partitions
    before a heavy ``mapInPandas`` stage -- the repartition this
    module's scale notes prescribe.

    Two regimes, unioned without a further shuffle:
    - normal payloads spread by a hash of the id: with bounded sizes,
      per-partition byte sums concentrate around the mean (law of
      large numbers);
    - heavy payloads (>= ``heavy_bytes``, e.g. raw video) are the
      heavy-tail that breaks that argument AND that hashing cannot fix
      (two heavy ids still collide mod n with probability 1/n), so the
      heavy subset is range-partitioned on (payload size desc, id):
      contiguous equal-COUNT ranges -- ceil(n_heavy / n) rows per
      partition -- with similar-size payloads grouped, deterministic
      boundaries (RangePartitioner samples with a fixed seed), and no
      dependence on round-robin's per-input-partition offsets.

    The union concatenates the two children's partitions, so the
    decode stage sees 2 x n_partitions tasks: n hash-spread normal
    partitions plus n exactly-balanced heavy partitions.
    """
    nbytes = F.length(F.col(payload_col))
    normal = df.filter(
        nbytes < heavy_bytes
    ).repartition(n_partitions, F.hash(F.col(id_col)))
    heavy = df.filter(nbytes >= heavy_bytes).repartitionByRange(
        n_partitions, nbytes.desc(), F.col(id_col)
    )
    return normal.unionByName(heavy)


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("mean_luma", LongType(), True),
    ]
)


def decode_frame(payload: bytes, frame_idx: int, fake: bool = False) -> int:
    """Decode one sampled video frame -> mean luma. STUB: real decoding
    needs a video codec; ``fake=True`` reads a deterministic
    pseudo-frame (a byte window at the frame's nominal offset) so the
    fan-out plumbing is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "video decoding requires a codec library; run with fake=True "
            "for deterministic plumbing tests"
        )
    if not payload:
        return 0
    start = (frame_idx * 1000) % max(len(payload), 1)
    window = payload[start : start + 64] or payload[:64]
    return sum(window) // len(window)


def video_frame_features(
    media: DataFrame, every_n: int = 30, fake: bool = True
) -> DataFrame:
    """Frame-sampled video features: the :func:`frame_sample_plan`
    fan-out joined back to its payload, decoded per frame via one
    Arrow-batched ``mapInPandas`` -- the complete video shape (sample ->
    decode -> per-frame features), same stub policy as image/audio.

    The join broadcasts the (media_id, frame_idx) plan side when small;
    payload bytes cross the Python boundary once per video row per
    batch, not once per frame, because frames of one video land in the
    same Arrow batch after the join preserves payload locality."""
    frames = frame_sample_plan(media, every_n=every_n)
    joined = frames.join(
        media.select("media_id", "payload"), "media_id"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, idx, payload in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["payload"]
            ):
                data = bytes(payload) if payload is not None else b""
                rows.append((mid, idx, decode_frame(data, int(idx), fake=fake)))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "mean_luma"]
            )

    return joined.mapInPandas(extract, VIDEO_FRAME_SCHEMA)
