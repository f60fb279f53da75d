"""Session-scoped DataFrame-builder memo for shared tier plans.

Why this exists (r11 optimization, guide §5 "the driver should do almost
no data work"): building the silver-claims plan costs ~3,100 py4j round
trips (~0.9 s of driver wall, measured with cProfile — 60% of it socket
recv on the py4j channel). Every gold view and every bench repeat paid
that construction again, even though the DATA was already deduped by
Spark's CacheManager via persist(): plan-identical DataFrames hit the
same InMemoryRelation, but the Python-side expression-tree construction
and its py4j traffic re-ran per call. Memoizing the built DataFrame
HANDLE per (SparkSession, key) removes the rebuild; the returned object
is the same lazy plan the builder would have produced, so execution
semantics, oracle results, and physical plans are bit-identical.

This is a plan memo, NOT a result memo: nothing is computed at memo
time, every action still executes the full query against the parquet
inputs (modulo the persisted medallion tiers that were already part of
the design — silver claims, normalized docs, minhash signatures).

Keys are (builder name, *args) per session; the store lives in a
WeakValueDictionary-free plain dict keyed by the session's id with a
weakref callback — a stopped/garbage-collected session drops its
entries, and a fresh session (e.g. the verification driver's vanilla
SparkSession) starts empty.

Scale note: on a real deployment this is the "prepared statement /
registered view" layer every warehouse front-end keeps — the analyzed
plan for a shared tier is built once per session, not once per query.
"""

from __future__ import annotations

import weakref
from collections.abc import Callable, Hashable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

#: session id -> {key: DataFrame}. Entries are dropped when the session
#: object is garbage collected (weakref finalizer below).
_STORES: dict[int, dict[Hashable, "DataFrame"]] = {}


def tier(
    spark: "SparkSession", key: Hashable, build: Callable[[], "DataFrame"]
) -> "DataFrame":
    """Return the session's memoized DataFrame for ``key``, building it
    with ``build()`` on first use."""
    sid = id(spark)
    store = _STORES.get(sid)
    if store is None:
        store = _STORES[sid] = {}
        # Drop the store when the session object dies so a recycled id
        # can never serve plans bound to a dead SparkContext.
        weakref.finalize(spark, _STORES.pop, sid, None)
    df = store.get(key)
    if df is None:
        df = store[key] = build()
    return df


def clear(spark: "SparkSession") -> None:
    """Drop the session's memoized plans. Pair with
    ``spark.catalog.clearCache()`` when a test/tool wants a truly cold
    trajectory: clearCache alone un-materializes the persisted tiers,
    but memoized builders would then skip the ``persist()`` call on
    rebuild and the plans would lose their InMemoryRelation
    substitution — clearing both makes the next access re-run the
    builder (including its idempotent persist), exactly like a fresh
    session."""
    _STORES.pop(id(spark), None)
