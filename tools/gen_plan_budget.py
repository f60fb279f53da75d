#!/usr/bin/env python3
"""Generate tests/plan_budgets.json: the shuffle budget per registered
query — Exchange-node counts of the physical plan at the test SF.

The budget is a REGRESSION CEILING, not a target: tests assert each
query's plan never exceeds its recorded exchange count, so a refactor
that silently introduces an extra shuffle (the classic 100 TB
regression — invisible to value checks, catastrophic at scale) fails
CI immediately. Regenerate deliberately after an intentional plan
change: python tools/gen_plan_budget.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("LAKEFLOW_TEST_SF_DIR", "/root/testdata/sf0.001")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "plan_budgets.json")

EXCHANGE_MARKERS = (
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "Exchange SinglePartition",
    "Exchange RoundRobinPartitioning",
)


def count_exchanges(df) -> int:
    # alias() probe = fresh unexecuted QueryExecution; see the twin
    # comment in tests/test_plan_budget.py (_count_exchanges)
    p = df.alias("__plan_probe__")._jdf.queryExecution().executedPlan().toString()
    return sum(p.count(m) for m in EXCHANGE_MARKERS)


def main() -> None:
    """Budgets are PER SCALE FACTOR (broadcast-threshold flips change
    exchange counts between SFs), keyed by the sf dir basename; one
    run refreshes the entry for each dir passed (default: the two SFs
    the test suite runs at)."""
    from lakeflow import registry
    from lakeflow.session import get_session

    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ]
    spark = get_session("plan-budget", master="local[4]", shuffle_partitions=8)
    all_budgets: dict[str, dict[str, int]] = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            all_budgets = json.load(f)
    for sf_dir in sf_dirs:
        key = os.path.basename(sf_dir.rstrip("/"))
        budgets: dict[str, int] = {}
        for name, (fn, _) in sorted(registry.ALL_QUERIES.items()):
            # eager-materializing queries print a truncated (0-Exchange)
            # plan; budget their lazy plan-inspection twins instead
            fn = registry.PLAN_VARIANTS.get(name, fn)
            try:
                budgets[name] = count_exchanges(fn(spark, sf_dir))
            except Exception as e:  # iterative ops that need state dirs etc.
                print(f"{key}/{name}: SKIP ({type(e).__name__})", file=sys.stderr)
        all_budgets[key] = budgets
        print(f"{key}: {len(budgets)} budgets", file=sys.stderr)
    with open(OUT, "w") as f:
        json.dump(all_budgets, f, indent=1, sort_keys=True)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
