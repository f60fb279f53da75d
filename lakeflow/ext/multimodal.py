"""Multimodal-column plumbing (training-data pipeline surface).

Images/audio/video are opaque `binary` columns with typed metadata.
The real decoders (Pillow/ffmpeg/torchaudio) are NOT in this container,
so the decode step is stubbed behind ``DECODERS`` — but everything
Spark-side is real and tested: the binary column schema, the Arrow
batch shape through ``mapInPandas``, partition-preserving UDF plumbing,
and deterministic metadata extraction.

At 100 TB the binary payloads dominate I/O: the operators keep payloads
in their partitions (no shuffle of binary columns), project metadata
early, and only carry bytes through the decode stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeflow import io


def synthesize_binary_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake 'image' payloads: 64 bytes derived from the
    document text (md5 ×4), plus typed metadata — the schema a real
    multimodal table would have (payload binary, mime string, meta)."""
    # NULL text would synthesize a NULL payload and crash the decode
    # stubs executor-side (len(None)/None[:8]); a real ingest would
    # reject payload-less rows at the edge the same way.
    docs = io.read_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    payload_hex = F.concat(*[F.md5(F.concat(F.col("text"), F.lit(str(i)))) for i in range(4)])
    return docs.select(
        "doc_id",
        F.unhex(payload_hex).alias("payload"),
        F.lit("image/fake").alias("mime"),
        (64 + F.col("doc_id") % 512).cast("int").alias("width"),
        (64 + (F.col("doc_id") * 7) % 512).cast("int").alias("height"),
    )


def decode_stub(payload: bytes, mime: str) -> dict:
    """Placeholder for a real decoder. Deterministic fake 'decode':
    derives pseudo-pixel stats from the payload bytes. A production
    build registers real decoders in DECODERS keyed by mime type."""
    if mime != "image/fake":
        raise NotImplementedError(
            f"no decoder for {mime!r}: image/audio/video libraries are "
            "not available in this environment; register one in DECODERS"
        )
    return {
        "byte_len": len(payload),
        "first_byte": payload[0] if payload else None,
        "byte_sum": sum(payload) % 100_000,
    }


DECODERS = {"image/fake": decode_stub}


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode/feature-extract via mapInPandas — Arrow-batched, runs
    per-partition with zero shuffle; the pattern a real image decode /
    resize / frame-sample operator plugs into."""
    schema = "doc_id long, mime string, width int, height int, byte_len int, first_byte int, byte_sum long"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_stub(p, m) for p, m in zip(pdf["payload"], pdf["mime"])]
            fdf = pd.DataFrame(feats)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "mime": pdf["mime"].values,
                    "width": pdf["width"].values,
                    "height": pdf["height"].values,
                    "byte_len": fdf["byte_len"].values,
                    "first_byte": fdf["first_byte"].values,
                    "byte_sum": fdf["byte_sum"].values,
                }
            )

    return df.mapInPandas(batches, schema=schema)


def resize_stub(payload: bytes, width: int, height: int, out_w: int, out_h: int) -> dict:
    """Placeholder for a real resize (Pillow's Image.resize). The fake
    is deterministic: output byte length is out_w*out_h*3 (RGB) and a
    checksum derived from the source payload, so tests can assert the
    plumbing end-to-end without an image library."""
    return {
        "out_len": out_w * out_h * 3,
        "checksum": sum(payload) % 65_536,
    }


def resize_images(df: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Image resize via mapInPandas — same zero-shuffle, Arrow-batched
    shape as extract_features; swap resize_stub for a real decoder to
    productionize. Payload bytes never cross a shuffle boundary."""
    schema = "doc_id long, width int, height int, out_w int, out_h int, out_len int, checksum int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rs = [
                resize_stub(p, w, h, out_w, out_h)
                for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
            ]
            rdf = pd.DataFrame(rs)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": pdf["width"].values,
                    "height": pdf["height"].values,
                    "out_w": out_w,
                    "out_h": out_h,
                    "out_len": rdf["out_len"].values,
                    "checksum": rdf["checksum"].values,
                }
            )

    return df.mapInPandas(batches, schema=schema)


def synthesize_videos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake 'video' payloads over documents: an opaque
    binary column plus the typed metadata a real video table carries
    (duration_ms, fps). duration is a closed-form function of doc_id so
    frame-sampling results stay oracle-checkable."""
    docs = io.read_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return docs.select(
        "doc_id",
        F.unhex(F.md5(F.col("text"))).alias("payload"),
        F.lit("video/fake").alias("mime"),
        (1_000 + (F.col("doc_id") * 37) % 9_000).cast("int").alias("duration_ms"),
        F.lit(25).alias("fps"),
    )


def sample_frames(df: DataFrame, every_ms: int = 1_000) -> DataFrame:
    """Frame sampling via mapInPandas: one input video row fans out to
    one row per sampled frame (ts 0, every_ms, 2*every_ms, … ≤ duration)
    with a deterministic fake frame payload. The fan-out happens inside
    the partition — no shuffle, no explode of materialized frame arrays
    (at 100 TB the frames must never exist as one giant array value; a
    real decoder yields them incrementally exactly like this)."""
    schema = "doc_id long, frame_idx int, frame_ts_ms int, frame_bytes binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, payload, dur in zip(
                pdf["doc_id"], pdf["payload"], pdf["duration_ms"]
            ):
                for i in range(0, int(dur) // every_ms + 1):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(bytes(payload[:8]) + i.to_bytes(4, "big"))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_ts_ms": tss, "frame_bytes": frames}
            )

    return df.mapInPandas(batches, schema=schema)


def frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: synthesize videos → per-partition frame fan-out →
    aggregate frames back per video. n_frames/last_frame_ts are
    closed-form in doc_id, so the whole pipeline is oracle-checked."""
    frames = sample_frames(synthesize_videos(spark, sf_dir))
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_frames"),
            F.max("frame_ts_ms").alias("last_frame_ts_ms"),
            F.min(F.length("frame_bytes")).cast("int").alias("frame_len"),
        )
        .orderBy("doc_id")
    )


FRAME_SAMPLE_SQL = """
SELECT doc_id,
       CAST((1000 + (doc_id * 37) % 9000) // 1000 + 1 AS BIGINT) AS n_frames,
       CAST(((1000 + (doc_id * 37) % 9000) // 1000) * 1000 AS INTEGER) AS last_frame_ts_ms,
       CAST(12 AS INTEGER) AS frame_len
FROM documents WHERE text IS NOT NULL ORDER BY doc_id
"""


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: synthesize binary column → mapInPandas feature
    extraction → metadata projection. byte_len/width/height are
    SQL-mirrorable, so the whole plumbing is oracle-checked."""
    return extract_features(synthesize_binary_docs(spark, sf_dir)).select(
        "doc_id", "mime", "width", "height", "byte_len"
    ).orderBy("doc_id")


MULTIMODAL_META_SQL = """
SELECT doc_id,
       'image/fake' AS mime,
       CAST(64 + doc_id % 512 AS INTEGER) AS width,
       CAST(64 + (doc_id * 7) % 512 AS INTEGER) AS height,
       64 AS byte_len
FROM documents WHERE text IS NOT NULL ORDER BY doc_id
"""
