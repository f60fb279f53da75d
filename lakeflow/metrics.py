"""Engine observability — measured per-query execution metrics.

The reference ships a Prometheus + Grafana metrics stack
(/root/reference/compose/metrics.yml:7-63,
/root/reference/deploy/prometheus/prometheus.yml) scraping its
pipeline services; this module is the engine-side analogue: after a
query runs, the executed physical plan's accumulated SQLMetrics are
walked and aggregated into the numbers a production operator alerts
on — rows/bytes/files scanned, shuffle bytes written and read, spill,
broadcast size, peak node memory, wall time.

Why plan-walk instead of a listener: PySpark cannot implement the JVM
``QueryExecutionListener`` interface without the py4j callback server
(fragile in embedded/driver environments). Every SQLMetric a listener
would see is ALSO accumulated on the executed-plan tree itself, so
walking the tree after the action yields the identical numbers with
zero runtime hooks — and works on any SparkSession, including the
vanilla one the external driver builds.

What this buys beyond the plan-shape gates (tests/test_plan_budget.py
pins Exchange COUNTS): measured BYTES. A plan can keep its exchange
count while silently shuffling 100× more data (wider rows, lost
partial aggregation); the byte-level assertions in
tests/test_metrics.py catch exactly that class — e.g. the bucketed
co-located join measurably writes ZERO shuffle bytes, and partition
pruning measurably reads fewer files.

At 100 TB this surface is what feeds the alerting pipeline: emit one
row per registered query run into a TxTable and alert on deltas
(shuffle bytes regression week-over-week is the canonical "someone
broke partial aggregation" signal).
"""

from __future__ import annotations

import time
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

# metric keys summed per node class (key -> output field)
_SCAN_NODES = ("FileSourceScanExec", "BatchScanExec", "RowDataSourceScanExec")

METRICS_SCHEMA = (
    "query string, wall_sec double, output_rows bigint, "
    "rows_scanned bigint, files_read bigint, bytes_scanned bigint, "
    "shuffle_bytes_written bigint, shuffle_records_written bigint, "
    "shuffle_bytes_read bigint, spill_bytes bigint, "
    "broadcast_bytes bigint, n_exchanges int, n_scans int, "
    "cache_rows_read bigint, peak_node_memory bigint"
)


def _metric_values(node: Any) -> dict[str, int]:
    """SQLMetric map of one plan node → {key: accumulated value}."""
    out: dict[str, int] = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        try:
            out[kv._1()] = int(kv._2().value())
        except Exception:  # pragma: no cover - defensive vs metric types
            pass
    return out


def plan_metrics(df: DataFrame) -> dict[str, int]:
    """Aggregate the executed plan's accumulated SQLMetrics.

    Call AFTER an action has run on ``df`` (the metrics are zero
    before execution). Descends through AQE wrappers
    (AdaptiveSparkPlanExec → final plan, *QueryStageExec → stage
    plan) and reused exchanges/subqueries are visited once — matching
    what actually executed.

    Caveat (documented, inherent): subtrees hidden behind an
    InMemoryTableScan report the CACHE READ, not the original build —
    the same blind spot the SQL UI has.
    """
    agg = {
        "rows_scanned": 0,
        "files_read": 0,
        "bytes_scanned": 0,
        "shuffle_bytes_written": 0,
        "shuffle_records_written": 0,
        "shuffle_bytes_read": 0,
        "spill_bytes": 0,
        "broadcast_bytes": 0,
        "n_exchanges": 0,
        "n_scans": 0,
        "cache_rows_read": 0,
        "peak_node_memory": 0,
    }
    seen: set[int] = set()

    def walk(node: Any) -> None:
        nid = node.id()
        if nid in seen:  # ReusedExchange targets etc.
            return
        seen.add(nid)
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if name.endswith("QueryStageExec"):
            walk(node.plan())
            return
        m = _metric_values(node)
        if name in _SCAN_NODES:
            agg["n_scans"] += 1
            agg["rows_scanned"] += m.get("numOutputRows", 0)
            agg["files_read"] += m.get("numFiles", 0)
            agg["bytes_scanned"] += m.get("filesSize", 0)
        elif name == "ShuffleExchangeExec":
            agg["n_exchanges"] += 1
            agg["shuffle_bytes_written"] += m.get("shuffleBytesWritten", 0)
            agg["shuffle_records_written"] += m.get("shuffleRecordsWritten", 0)
            agg["shuffle_bytes_read"] += m.get("localBytesRead", 0) + m.get(
                "remoteBytesRead", 0
            )
        elif name == "BroadcastExchangeExec":
            agg["broadcast_bytes"] += m.get("dataSize", 0)
        elif name == "InMemoryTableScanExec":
            # cached tier read — the file scan behind it happened at
            # cache-build time (see caveat above); surfaced separately
            # so "rows_scanned == 0" is readable as "served from cache"
            agg["cache_rows_read"] += m.get("numOutputRows", 0)
        agg["spill_bytes"] += m.get("spillSize", 0) + m.get("diskBytesSpilled", 0)
        agg["peak_node_memory"] = max(
            agg["peak_node_memory"], m.get("peakMemory", 0)
        )
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return agg


def run_instrumented(
    spark: SparkSession,
    name: str,
    fn: Callable[[SparkSession, str], DataFrame],
    sf_dir: str,
) -> dict[str, Any]:
    """Run one registered-query builder end-to-end and return its
    metrics row: wall time + the plan-walk aggregates."""
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    rows = df.collect()
    wall = time.perf_counter() - t0
    rec: dict[str, Any] = {
        "query": name,
        "wall_sec": round(wall, 3),
        "output_rows": len(rows),
    }
    rec.update(plan_metrics(df))
    return rec


def query_metrics(
    spark: SparkSession, names: list[str], sf_dir: str
) -> DataFrame:
    """The metrics TABLE: one row per registered query run — the
    surface a deployment writes to a TxTable per pipeline run and
    alerts on (shuffle-bytes/spill regressions, scan amplification).
    """
    from lakeflow import registry

    recs = []
    for n in names:
        fn, _ = registry.ALL_QUERIES[n]
        recs.append(run_instrumented(spark, n, fn, sf_dir))
    cols = [c.split()[0] for c in METRICS_SCHEMA.split(", ")]
    return spark.createDataFrame(
        [tuple(r[c] for c in cols) for r in recs], METRICS_SCHEMA
    )
