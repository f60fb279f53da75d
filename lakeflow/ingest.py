"""Bronze-tier ingestion — CSV → table with lineage metadata.

Reference parity: /root/reference/jobs/bronze/ingest_csv_to_delta.py
(S1 CSV source, P1 lineage columns, S3 merge-schema append). The
reference's double `count()` materialization (:51,:55) is NOT copied —
emptiness is checked with `isEmpty()` (metadata/1-row scan).

`now` is injectable so pipelines are replayable/testable; production
callers pass nothing and get wall-clock lineage like the reference.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeflow.io import read_csv_source, write_partitioned


def with_lineage(
    df: DataFrame, source_file: str = "csv", now: dt.datetime | None = None
) -> DataFrame:
    """P1 — append ingestion_timestamp / source_file / batch_id
    (ingest_csv_to_delta.py:60-63)."""
    if now is None:
        ts = F.current_timestamp()
        batch = F.date_format(F.current_timestamp(), "yyyyMMdd_HHmmss")
    else:
        ts = F.lit(now).cast("timestamp_ntz")
        batch = F.lit(now.strftime("%Y%m%d_%H%M%S"))
    return (
        df.withColumn("ingestion_timestamp", ts)
        .withColumn("source_file", F.lit(source_file))
        .withColumn("batch_id", batch)
    )


def ingest_csv(
    spark: SparkSession,
    input_glob: str,
    output_path: str,
    fmt: str = "parquet",
    now: dt.datetime | None = None,
) -> int:
    """Bronze job: glob-read CSVs, add lineage, append to the lake.
    Returns number of rows ingested (0 → skipped, S9 empty-input guard).
    """
    df = with_lineage(read_csv_source(spark, input_glob), source_file="csv", now=now)
    # One CSV materialization serves both the S9 emptiness check and the
    # returned batch count (re-reading the output table after an append
    # would report the cumulative table size, not this batch).
    df = df.persist()
    try:
        n = df.count()
        if n == 0:
            return 0
        write_partitioned(df, output_path, fmt=fmt, mode="append")
        return n
    finally:
        df.unpersist()


def ingest_csv_permissive(
    spark: SparkSession,
    input_glob: str,
    schema,
    quarantine_path: str | None = None,
) -> tuple:
    """Robust bronze ingestion: PERMISSIVE CSV parsing against an
    expected schema, with malformed rows captured in a
    ``_corrupt_record`` column and split into a quarantine frame
    instead of failing the batch (FAILFAST) or silently dropping
    (DROPMALFORMED) — the error-tolerant upgrade of the reference's
    inferSchema read (/root/reference/jobs/bronze/ingest_csv_to_delta.py:44-49).

    Returns (clean_df, quarantine_df). The split filters on the RAW
    _corrupt_record column (pushdown-safe), and callers land the
    quarantine frame next to the bronze table so reprocessing is a
    re-read, not a re-crawl.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructType

    schema_with_err: StructType = StructType(schema.fields[:]).add(
        "_corrupt_record", StringType()
    )
    raw = (
        spark.read.schema(schema_with_err)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(input_glob)
        # the corrupt-record column is only filled when the parsed row
        # is also cached/materialized per Spark's semantics — a cache
        # here makes the clean/quarantine split read one materialization
        .cache()
    )
    clean = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantine = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    if quarantine_path is not None and not quarantine.isEmpty():
        quarantine.write.mode("append").parquet(quarantine_path)
    return clean, quarantine
