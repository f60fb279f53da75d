#!/usr/bin/env python3
"""Audit which registered queries have a fully LAZY plan construction —
i.e. calling fn(spark, sf_dir) launches zero Spark jobs.

Only these are eligible for the registry's prepared-plan memo
(lakeflow/registry.py _prepared): for a lazy builder, memoizing the
built handle skips pure py4j plan-construction overhead and nothing
else. Builders that run Spark jobs during construction (iterative
localCheckpoint loops, driver-side collects: pagerank, kcore, BPE, MMR,
dedup clusters, ...) must rebuild per call so every invocation re-does
that work — memoizing them would be result caching, which the bench
contract forbids.

Writes lakeflow/lazy_build.json: sorted list of lazy-construction query
names. Run after adding/changing registered queries:

    python tools/audit_lazy_build.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakeflow import registry  # noqa: E402
from lakeflow.session import get_session  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lakeflow",
    "lazy_build.json",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("lakeflow-audit-lazy")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    lazy: list[str] = []
    eager: list[str] = []
    # Warm pass: build everything once so one-off schema-inference jobs
    # (first spark.read.parquet per table) don't mis-flag lazy builders.
    # Raw builders (pre-wrap): ALL_QUERIES values, not queries().
    for name, (fn, _sql) in registry.ALL_QUERIES.items():
        try:
            fn(spark, sf_dir)
        except Exception:
            pass
    # Audit pass: a truly lazy builder launches zero jobs on a warm
    # session; eager builders (iterative loops, driver collects) re-run
    # their jobs every build and stay flagged.
    for name, (fn, _sql) in registry.ALL_QUERIES.items():
        group = f"audit-{name}"
        sc.setJobGroup(group, name)
        try:
            fn(spark, sf_dir)
        except Exception as e:  # a build that fails is not memoizable either
            print(f"# {name}: build error {type(e).__name__}: {e}", file=sys.stderr)
            eager.append(name)
            continue
        finally:
            sc.setJobGroup(None, None)
        jobs = tracker.getJobIdsForGroup(group)
        (lazy if not jobs else eager).append(name)
        if jobs:
            print(f"# EAGER {name}: {len(jobs)} job(s) during construction",
                  file=sys.stderr)
    print(f"# lazy {len(lazy)} / eager {len(eager)}", file=sys.stderr)
    with open(OUT, "w") as fh:
        json.dump(sorted(lazy), fh, indent=1)
        fh.write("\n")
    print(f"wrote {OUT}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
