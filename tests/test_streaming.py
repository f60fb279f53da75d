"""Structured Streaming operators: each streaming twin must agree with
its batch counterpart when drained with trigger(availableNow=True)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lakeflow import streaming
from lakeflow.ext import events as batch_events


def test_stream_ingest_csv(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    (src / "claims1.csv").write_text(
        'claim_id,claim_amount\nC1,10.5\nC2,"20,5 quoted"\n'
    )
    (src / "claims2.csv").write_text("claim_id,claim_amount\nC3,30.0\n")
    schema = "claim_id string, claim_amount string"
    from pyspark.sql.types import StructType

    stream = streaming.stream_ingest_csv(
        spark, str(src), StructType.fromDDL(schema)
    )
    assert stream.isStreaming
    dst = tmp_path / "bronze"
    streaming.run_to_parquet(stream, str(dst), str(tmp_path / "ckpt"))
    out = spark.read.parquet(str(dst))
    assert out.count() == 3
    for col in ("ingestion_timestamp", "source_file", "batch_id"):
        assert col in out.columns
    # exactly-once: re-running the same checkpoint ingests nothing new
    stream2 = streaming.stream_ingest_csv(spark, str(src), StructType.fromDDL(schema))
    streaming.run_to_parquet(stream2, str(dst), str(tmp_path / "ckpt"))
    assert spark.read.parquet(str(dst)).count() == 3


def _ntz(df, col):
    """Streaming event time is TIMESTAMP (watermark requirement); batch
    twins use TIMESTAMP_NTZ — align under the UTC session tz."""
    return df.withColumn(col, F.col(col).cast("timestamp_ntz"))


def test_tumbling_stream_matches_batch(spark, sf_dir, tmp_path):
    stream = streaming.tumbling_counts_stream(streaming.events_stream(spark, sf_dir))
    got = _ntz(
        streaming.run_available_now(stream, str(tmp_path), output_mode="complete"),
        "bucket_start",
    )
    want = batch_events.tumbling_counts(spark, sf_dir)
    g = {
        (r.bucket_start, r.event_type): (r.events, r.total_value)
        for r in got.collect()
    }
    w = {
        (r.bucket_start, r.event_type): (r.events, r.total_value)
        for r in want.collect()
    }
    assert g == w


def test_session_window_stream_matches_batch(spark, sf_dir, tmp_path):
    stream = streaming.session_counts_stream(streaming.events_stream(spark, sf_dir))
    got = _ntz(
        streaming.run_available_now(stream, str(tmp_path), output_mode="complete"),
        "session_start",
    )
    want = batch_events.session_window_counts(spark, sf_dir)
    g = {(r.user_id, r.session_start): r.events_in_session for r in got.collect()}
    w = {(r.user_id, r.session_start): r.events_in_session for r in want.collect()}
    assert g == w


def test_session_window_equals_lag_sessionize(spark, sf_dir):
    """The built-in session_window operator and the lag-based batch
    sessionizer implement the same gap semantics."""
    sw = batch_events.session_window_counts(spark, sf_dir)
    lag = batch_events.sessionize(spark, sf_dir)
    g = {(r.user_id, r.session_start): r.events_in_session for r in sw.collect()}
    w = {(r.user_id, r.session_start): r.events_in_session for r in lag.collect()}
    assert g == w


def test_dedup_stream(spark, sf_dir, tmp_path):
    ev = streaming.events_stream(spark, sf_dir)
    # duplicate the stream rows: union with itself → every event twice
    doubled = ev.union(ev)
    out = streaming.run_available_now(
        streaming.dedup_stream(doubled), str(tmp_path), output_mode="append"
    )
    n_unique = out.select("event_id").distinct().count()
    assert out.count() == n_unique
    base = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert n_unique == base


def test_watermark_append_mode_emits_closed_windows(spark, sf_dir, tmp_path):
    """Append mode with a watermark only emits windows the watermark has
    passed — the late-data contract (windows near max event time stay
    open and are withheld)."""
    stream = streaming.tumbling_counts_stream(
        streaming.events_stream(spark, sf_dir), watermark="2 hours"
    )
    got = _ntz(
        streaming.run_available_now(stream, str(tmp_path), output_mode="append"),
        "bucket_start",
    )
    want = batch_events.tumbling_counts(spark, sf_dir)
    g = {(r.bucket_start, r.event_type): r.events for r in got.collect()}
    w = {(r.bucket_start, r.event_type): r.events for r in want.collect()}
    assert set(g).issubset(set(w))
    for k, v in g.items():
        assert w[k] == v
    # the withheld tail is exactly the windows within the watermark of
    # the max event time
    max_ts = spark.read.parquet(f"{sf_dir}/events.parquet").agg(
        F.max(F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    ).collect()[0][0]
    withheld = {k for k in w if k not in g}
    assert withheld  # some open windows exist
    import datetime

    horizon = max_ts - datetime.timedelta(hours=3)  # 1h window + 2h watermark
    assert all(bucket >= horizon for bucket, _ in withheld)
