#!/usr/bin/env python3
"""Per-query time breakdown: plan build vs analysis vs optimization vs
execution (guide §1 — measure first, decide after).

For each bench query, times:
- build_ms:    qmap[name](spark, sf_dir)      (Python plan construction)
- analyze_ms:  df.schema                      (Catalyst analysis)
- plan_ms:     df._jdf.queryExecution().executedPlan()  (optimize + physical plan)
- exec_ms:     median of 3 df.count() on FRESH builds (the bench shape)

Warm-up: one full count per query first (persisted tiers materialize,
JIT warms) so the breakdown reflects the bench's warm repeats.

Usage: python tools/profile_breakdown.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402
from lakeflow import registry  # noqa: E402
from lakeflow.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or list(BENCH_QUERIES)
    spark = get_session("lakeflow-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()

    out = {}
    for name in names:
        fn = qmap[name]
        fn(spark, sf_dir).count()  # warm (materialize persisted tiers, JIT)

        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        _ = df.schema
        t2 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t3 = time.perf_counter()

        runs = []
        for _ in range(3):
            t4 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - t4)
        rec = {
            "build_ms": round((t1 - t0) * 1e3, 1),
            "analyze_ms": round((t2 - t1) * 1e3, 1),
            "plan_ms": round((t3 - t2) * 1e3, 1),
            "exec_ms": round(sorted(runs)[1] * 1e3, 1),
        }
        out[name] = rec
        print(f"{name}: {rec}", file=sys.stderr)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
