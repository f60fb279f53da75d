"""End-to-end streaming-ingest demo: file-source stream → bronze
parquet (exactly-once) → watermarked gold rollup → scrapeable
/metrics — the medallion cadence the reference schedules with Airflow
(`dags/bronze_ingest_csv.py:22`, hourly re-glob) and scrapes with
Prometheus (`compose/metrics.yml`), expressed as one Structured
Streaming program with checkpointed exactly-once file tracking and the
engine's own measured-metrics endpoint.

Run it from a REPL or the README snippet::

    from lakeflow.demo import streaming_ingest_demo
    from lakeflow.session import get_session

    summary = streaming_ingest_demo(
        get_session("demo"), "/root/testdata/sf0.01", "/tmp/lakeflow-demo"
    )

Everything drains with ``trigger(availableNow=True)`` — one
incremental batch per invocation, the same semantics a long-running
trigger applies per micro-batch, so a re-run ingests only new files
(the checkpoint remembers processed ones) and the demo is idempotent.
"""

from __future__ import annotations

import os
import urllib.request
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeflow import metrics, streaming


def _batch_rollup(bronze: DataFrame) -> DataFrame:
    """Batch twin of the gold-tier streaming rollup, over the SAME
    bronze table — the agreement check the demo reports (streaming
    correctness is certified this way throughout tests/test_streaming)."""
    return (
        bronze.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(F.col("w.start").alias("bucket_start"), "event_type", "events",
                "total_value")
    )


def streaming_ingest_demo(
    spark: SparkSession, sf_dir: str, work_dir: str
) -> dict[str, Any]:
    """Run the three-stage demo; returns a summary dict.

    1. **Bronze**: stream the events file source into an
       event_type-partitioned parquet sink. The checkpointed file
       manifest makes the ingest exactly-once across re-runs.
    2. **Gold**: re-stream the bronze DIRECTORY (new bronze files would
       be picked up incrementally) through the watermarked tumbling
       rollup into an in-memory gold table.
    3. **Observability**: measure the rollup's batch twin over bronze
       with :func:`lakeflow.metrics.run_instrumented`, serve the record
       on a :class:`lakeflow.metrics.MetricsEndpoint`, and scrape it
       back over HTTP — the round trip a Prometheus server makes.
    """
    bronze_dir = os.path.join(work_dir, "bronze_events")
    streaming.run_to_parquet(
        streaming.events_stream(spark, sf_dir),
        bronze_dir,
        os.path.join(work_dir, "ckpt_bronze"),
        partition_by=("event_type",),
    )
    bronze = spark.read.parquet(bronze_dir)
    bronze_rows = bronze.count()

    gold_stream = streaming.tumbling_counts_stream(
        spark.readStream.schema(bronze.schema).parquet(bronze_dir)
    )
    gold = streaming.run_available_now(
        gold_stream,
        os.path.join(work_dir, "ckpt_gold"),
        output_mode="complete",
        name="demo_gold_rollup",
    )
    stream_rows = {
        (r.bucket_start, r.event_type): (r.events, r.total_value)
        for r in gold.select(
            F.col("bucket_start").cast("timestamp_ntz").alias("bucket_start"),
            "event_type", "events", "total_value",
        ).collect()
    }
    batch_rows = {
        (r.bucket_start, r.event_type): (r.events, r.total_value)
        for r in _batch_rollup(
            bronze.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        ).collect()
    }

    record = metrics.run_instrumented(
        spark, "demo_gold_rollup", lambda s, _: _batch_rollup(bronze), sf_dir
    )
    endpoint = metrics.MetricsEndpoint()
    try:
        endpoint.update([record])
        with urllib.request.urlopen(endpoint.url, timeout=10) as resp:
            payload = resp.read().decode()
    finally:
        endpoint.close()

    return {
        "bronze_rows": bronze_rows,
        "gold_windows": len(stream_rows),
        # None on an incremental re-run that saw no new bronze files:
        # the gold drain legitimately emits nothing (exactly-once), so
        # there is no fresh stream output to compare
        "stream_matches_batch": (
            stream_rows == batch_rows if stream_rows else None
        ),
        "rollup_wall_sec": record["wall_sec"],
        "rollup_shuffle_bytes": record.get("shuffle_bytes_written", 0),
        "metrics_scraped": "lakeflow_query_wall_sec" in payload,
        "metrics_url_was": endpoint.url,
    }
