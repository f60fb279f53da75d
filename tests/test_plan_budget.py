"""Shuffle-budget regression gate: no registered query's physical plan
may grow MORE Exchange nodes than its committed budget
(tests/plan_budgets.json, regenerated deliberately via
tools/gen_plan_budget.py after intentional plan changes).

Value checks cannot see an extra shuffle; at 100 TB an extra shuffle
is the whole regression. This pins the plan shape of every query in
the registry, not just the hand-picked ones in test_plans.py.
"""

from __future__ import annotations

import json
import os

import pytest

from lakeflow import registry

_BUDGET_PATH = os.path.join(os.path.dirname(__file__), "plan_budgets.json")
with open(_BUDGET_PATH) as _f:
    _ALL: dict[str, dict[str, int]] = json.load(_f)
_SF_KEY = os.path.basename(
    os.environ.get("LAKEFLOW_TEST_SF_DIR", "/root/testdata/sf0.001").rstrip("/")
)
# budgets are per-SF (broadcast-threshold flips change exchange
# counts); an SF with no recorded budgets skips rather than guesses
BUDGETS: dict[str, int] = _ALL.get(_SF_KEY, {})

EXCHANGE_MARKERS = (
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "Exchange SinglePartition",
    "Exchange RoundRobinPartitioning",
)


def _count_exchanges(df) -> int:
    # Probe through a fresh Dataset wrapper: the prepared-plan memo
    # (r11, lakeflow.plancache) can hand back a DataFrame whose own
    # QueryExecution was already executed by an earlier test module, and
    # an EXECUTED AQE plan prints finalized per-stage subtrees whose
    # marker count differs from the initial plan the budgets were
    # recorded from. alias() builds a new, unexecuted QueryExecution
    # over the same analyzed plan — the exact pre-memo counting shape,
    # independent of session history.
    p = df.alias("__plan_probe__")._jdf.queryExecution().executedPlan().toString()
    return sum(p.count(m) for m in EXCHANGE_MARKERS)


@pytest.fixture(scope="module", autouse=True)
def _cold_cache(spark):
    """Budgets are recorded from a COLD session warming in sorted-name
    order (tools/gen_plan_budget.py); plans change shape when shared
    tier caches are already hot (InMemoryTableScan subtrees print their
    stored plan), so pin the same trajectory by starting cold. Later
    modules re-persist the tiers on first access — the tier builders
    call persist() idempotently."""
    spark.catalog.clearCache()
    # clearCache un-materializes the tiers but the r11 plan memo would
    # skip the builders' re-persist on rebuild — drop the memo too so
    # the next access re-runs each builder cold (see plancache.clear)
    from lakeflow import plancache

    plancache.clear(spark)
    yield


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_shuffle_budget(spark, sf_dir, name):
    fn, _ = registry.ALL_QUERIES[name]
    # eager-materializing queries (q_pagerank) truncate their printed
    # plan to a checkpoint scan; count the lazy twin's exchanges so the
    # gate can actually see an added shuffle (ADVICE r7 #1)
    fn = registry.PLAN_VARIANTS.get(name, fn)
    got = _count_exchanges(fn(spark, sf_dir))
    assert got <= BUDGETS[name], (
        f"{name}: plan now has {got} exchanges, budget is {BUDGETS[name]} — "
        "a shuffle was added. If intentional, regenerate via "
        "tools/gen_plan_budget.py"
    )


@pytest.mark.skipif(not BUDGETS, reason=f"no budgets recorded for {_SF_KEY}")
def test_budget_covers_registry():
    """Every oracle-bearing registered query is budget-pinned (new
    queries must be added by regenerating the budget file)."""
    missing = {
        n
        for n, (_, sql) in registry.ALL_QUERIES.items()
        if n not in BUDGETS
    }
    # EXPLICIT allowlist of legitimately-unbudgetable queries (none
    # today — every registered query pins a budget at both recorded
    # SFs). A new query must either get a budget (regenerate via
    # tools/gen_plan_budget.py) or be NAMED here with a reason; a
    # count ceiling would let new queries ship silently unpinned.
    allowed_unbudgeted: frozenset[str] = frozenset()
    assert missing <= allowed_unbudgeted, (
        f"unbudgeted queries not in allowlist: {sorted(missing - allowed_unbudgeted)} — "
        "regenerate tests/plan_budgets.json via tools/gen_plan_budget.py "
        "or name them in allowed_unbudgeted with a justification"
    )
