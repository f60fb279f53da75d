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
    docs = io.read_table(spark, sf_dir, "documents")
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
FROM documents ORDER BY doc_id
"""
