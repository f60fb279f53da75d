"""SparkSession factory.

Mirrors the session the reference builds in-job
(/root/reference/jobs/bronze/ingest_csv_to_delta.py:16-29 and
/root/reference/jobs/silver/claims_to_iceberg.py:19-35): AQE on,
partition coalescing on — but tuned for a modern Spark 4 deployment.

Scale notes (100 TB / 1000-executor design intent):
- AQE owns runtime partition counts; ``spark.sql.shuffle.partitions``
  is only an upper bound for the initial plan, so we set it to a few ×
  cores locally and would set it to a few × total-cores on a cluster.
- Arrow is enabled for any Pandas-UDF extension operators.
- Session timezone is pinned UTC so timestamp semantics are stable
  across driver/executor machines (and match naive-UTC engines such as
  the DuckDB oracle used by the test harness).

IMPORTANT: queries in :mod:`lakeflow.registry` must NOT depend on any
of these configs being set — the verification driver passes its own
SparkSession. Anything semantics-critical (ANSI-safe parsing via
``try_*`` functions, nanos-parquet handling) is done per-query in
:mod:`lakeflow.io` instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "lakeflow",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores if
    unset) so the same entrypoint works in tests and the bench driver.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(8, int(cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS); read as long, convert in io.py
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("LAKEFLOW_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def get_metastore_session(
    warehouse_dir: str,
    metastore_dir: str,
    app_name: str = "lakeflow-metastore",
    master: str | None = None,
) -> SparkSession:
    """SparkSession backed by a PERSISTENT catalog — the Hive-metastore
    role the reference deploys as a standalone service
    (/root/reference/compose/base.yml:98-110). Databases, tables, and
    non-temporary views created through this session are recorded in a
    Derby metastore at ``metastore_dir`` and survive the session: a
    later process pointing at the same two directories sees them.

    Derby is single-process (the local stand-in, exactly like the
    reference's single metastore container); a production deployment
    swaps the JDBC URL for Postgres/MySQL — same catalog surface.
    """
    return get_session(
        app_name=app_name,
        master=master,
        extra_conf={
            "spark.sql.warehouse.dir": warehouse_dir,
            "spark.sql.catalogImplementation": "hive",
            "javax.jdo.option.ConnectionURL": (
                f"jdbc:derby:;databaseName={metastore_dir};create=true"
            ),
            "spark.hadoop.datanucleus.schema.autoCreateAll": "true",
            "spark.hadoop.hive.metastore.schema.verification": "false",
        },
    )
