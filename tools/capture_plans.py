#!/usr/bin/env python3
"""Capture .explain("formatted") output for bench queries into
plans/<round>/<query>_<tag>.txt (judge-checkable plan evidence).

Usage: [LAKEFLOW_PLAN_ROUND=r12] python tools/capture_plans.py <tag> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402
from lakeflow import registry  # noqa: E402
from lakeflow.session import get_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", os.environ.get("LAKEFLOW_PLAN_ROUND", "r12"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("lakeflow-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()
    for name in names:
        fn = registry.PLAN_VARIANTS.get(name, qmap[name])
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)",
              file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
