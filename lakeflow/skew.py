"""Skew-join mitigation demo + measurement harness (VERDICT r2
next-round #5).

Three ways to survive a hot key, measured side by side on a
deliberately skewed join (half the fact rows collapse onto one key):

- **plain**: shuffled sort-merge join, AQE off — the straggler
  baseline: one reducer gets ~50% of the fact bytes.
- **aqe**: AQE skew-join split (``OptimizeSkewedJoin``) — the runtime
  re-plan that detects the oversized reducer partition from map output
  stats and splits it across tasks, replicating the matching build
  rows. The production default at scale.
- **salted**: :func:`lakeflow.relational.salted_join` — the manual
  mitigation for engines/joins AQE can't help (e.g. when the skewed
  side feeds an aggregation that pins the partitioning). At toy scale
  the ``salt``-fold replication of the right side usually COSTS more
  than the straggler; the bench records that honestly rather than
  cherry-picking a size where salting wins.

Hard-won activation facts (each cost a debugging round; pinned by
tests/test_plans.py::test_aqe_skew_split_activates):

1. **Skew split granularity is the MAP side.** A skewed reducer
   partition can only split along mapper boundaries
   (``PartialReducerPartitionSpec`` groups mapper ranges); a table
   that scans as ONE task — single file, or one row group even under a
   small ``files.maxPartitionBytes`` — yields a single indivisible
   chunk and ``createSkewPartitionSpecs`` returns None silently. The
   demo writes the skewed side as many real files. At 100 TB this
   never binds (thousands of mappers); at demo scale it is THE gotcha.
2. **Compression hides skew from the detector.** Sizes come from map
   output bytes: a constant hot key with low-entropy payload columns
   run-length-compresses so well the hot partition can fall under the
   threshold. The demo carries an incompressible md5 payload, as real
   wide rows would.
3. Thresholds are sized for clusters (256 MB default): the demo runs
   with partition-size thresholds scaled to the data so the same
   mechanism is observable at test SF.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (conf, demo value) — thresholds scaled so the detector sees toy-scale
# bytes; the MECHANISM under test is identical to the 256MB-default one.
_AQE_SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
}


def build_skewed_pair(
    spark: SparkSession, sf_dir: str, work_dir: str, files: int = 12
) -> tuple[str, str]:
    """Materialize the skewed join inputs under ``work_dir``:

    - left: lineitem with ~half of all rows collapsed onto key 0, plus
      an incompressible 64-byte md5 payload (facts #1/#2 above: many
      real files, high-entropy bytes — so the skew is visible to AQE's
      map-stats detector exactly as a production hot key would be).
    - right: one row per original key (dim-shaped, too big to want a
      manual broadcast at scale; AQE's stat-based broadcast is disabled
      in the demo confs to force the shuffled-join shapes).
    """
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    left_path = os.path.join(work_dir, "skew_left")
    right_path = os.path.join(work_dir, "skew_right")
    (
        li.select(
            F.when(F.pmod(F.hash("l_orderkey"), 2) == 0, F.lit(0))
            .otherwise(F.col("l_orderkey"))
            .alias("k"),
            "l_quantity",
            F.concat(
                F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber", F.lit("a"))),
                F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber", F.lit("b"))),
            ).alias("blob"),
        )
        .repartition(files)
        .write.mode("overwrite")
        .parquet(left_path)
    )
    (
        li.select(F.col("l_orderkey").alias("k"))
        .distinct()
        .withColumn("payload", F.md5(F.col("k").cast("string")))
        .write.mode("overwrite")
        .parquet(right_path)
    )
    return left_path, right_path


def _with_confs(spark: SparkSession, confs: dict[str, str]):
    saved = {}
    for k, v in confs.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    return saved


def _restore_confs(spark: SparkSession, saved: dict[str, str | None]) -> None:
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def run_skewed_join(
    spark: SparkSession,
    left_path: str,
    right_path: str,
    variant: str,
    skew_threshold: str = "1mb",
    salt: int = 8,
) -> DataFrame:
    """Build (don't execute) the skewed join under one mitigation
    variant: ``plain`` (AQE off), ``aqe`` (skew split on, thresholds
    scaled), or ``salted`` (manual salt spread, AQE off). Caller owns
    conf restoration via :func:`skew_timings` or executes immediately."""
    from lakeflow.relational import salted_join

    left = spark.read.parquet(left_path)
    right = spark.read.parquet(right_path)
    if variant == "salted":
        out = salted_join(left, right, "k", "k", salt=salt)
        # salted_join keeps both key columns; normalize to the plain shape
        return out.drop(right["k"]) if "k" in right.columns else out
    return left.join(right, "k")


def skew_timings(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    skew_threshold: str = "1mb",
    salt: int = 8,
) -> dict[str, float | bool]:
    """Measure the three variants (noop sink: full execution, zero
    driver transfer) and report whether AQE actually split the hot
    partition — the activation bit a silent-degrade would hide."""
    left_path, right_path = build_skewed_pair(spark, sf_dir, work_dir)
    out: dict[str, float | bool] = {}

    variants = {
        "plain": {"spark.sql.adaptive.enabled": "false",
                  "spark.sql.autoBroadcastJoinThreshold": "-1"},
        "salted": {"spark.sql.adaptive.enabled": "false",
                   "spark.sql.autoBroadcastJoinThreshold": "-1"},
        "aqe": {
            **_AQE_SKEW_CONFS,
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": skew_threshold,
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": skew_threshold,
        },
    }
    for name, confs in variants.items():
        saved = _with_confs(spark, confs)
        try:
            runs = []
            for i in range(4):  # 1 warm + 3 timed, report the median
                df = run_skewed_join(
                    spark, left_path, right_path, name if name != "aqe" else "plain",
                    salt=salt,
                )
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                if i > 0:
                    runs.append(time.perf_counter() - t0)
            out[f"{name}_sec"] = round(sorted(runs)[1], 3)
            if name == "aqe":
                # the noop write finalizes ITS OWN query execution, so
                # probe the final adaptive plan from a fresh DataFrame's
                # QE — finalized via foreach(no-op), which executes the
                # full join WITHOUT materializing any row on the driver
                # (a collect() here shipped the whole hot-keyed join,
                # blob column included, driver-side — ADVICE r3)
                df2 = run_skewed_join(spark, left_path, right_path, "plain", salt=salt)
                df2.foreach(lambda _: None)
                plan = df2._jdf.queryExecution().executedPlan().toString()
                out["aqe_skew_split_active"] = "skew=true" in plan
        finally:
            _restore_confs(spark, saved)
    return out
