"""Declarative data-quality suite evaluator (SURVEY.md §2.9, D1-D11).

Reads the Great-Expectations JSON dialect the reference ships
(/root/reference/dq/expectations/silver_claims.json) and evaluates the
whole suite in ONE Spark job: every expectation compiles to an
aggregate expression; a single global aggregate row is collected and
expanded into a per-expectation report.

Scale note: one pass over the table regardless of suite size — 23
expectations cost the same scan as one.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class ExpectationResult:
    expectation_type: str
    column: str | None
    success: bool
    observed: str


def _between(col: F.Column, lo: Any, hi: Any) -> F.Column:
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (col >= F.lit(lo))
    if hi is not None:
        cond = cond & (col <= F.lit(hi))
    return cond


def _violations(cond_ok: F.Column) -> F.Column:
    """Count of non-NULL values violating the condition."""
    return F.count(F.when(~cond_ok, 1))


def evaluate_suite(df: DataFrame, suite: dict) -> list[ExpectationResult]:
    """Evaluate a GE-dialect expectation suite; one aggregation pass."""
    aggs: list[F.Column] = [F.count("*").alias("_rows")]
    plans: list[tuple[int, dict]] = []  # (agg slot, expectation)
    dtypes = dict(df.dtypes)

    for exp in suite["expectations"]:
        etype = exp["expectation_type"]
        kw = exp.get("kwargs", {})
        col_name = kw.get("column")
        slot = len(aggs)
        col = F.col(col_name) if col_name else None

        if etype == "expect_column_to_exist":
            plans.append((-1, exp))  # schema-only, no aggregate
            continue
        if col_name is not None and col_name not in dtypes:
            plans.append((-2, exp))  # missing column → automatic fail
            continue

        if etype == "expect_column_values_to_not_be_null":
            aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"a{slot}"))
        elif etype == "expect_column_values_to_be_unique":
            aggs.append((F.count(col) - F.countDistinct(col)).alias(f"a{slot}"))
        elif etype == "expect_column_values_to_be_between":
            lo, hi = kw.get("min_value"), kw.get("max_value")
            if dtypes.get(col_name) == "date":
                lo = F.lit(lo).cast("date") if lo is not None else None
                hi = F.lit(hi).cast("date") if hi is not None else None
            aggs.append(_violations(_between(col, lo, hi)).alias(f"a{slot}"))
        elif etype == "expect_column_values_to_be_of_type":
            plans.append((-3, exp))  # schema-only
            continue
        elif etype == "expect_column_values_to_be_dateutil_parseable":
            # Approximates dateutil's permissive parser with a coalesce
            # over ISO timestamp/date plus the common non-ISO layouts
            # (month-first like dateutil's default, year-first slashed,
            # and spelled-month forms). Deviation from true dateutil:
            # exotic forms ("next tuesday", fuzzy text) still count as
            # violations — documented, deliberate (no Python-row path).
            s = col.cast("string")
            parsed = F.coalesce(
                F.try_to_timestamp(s),
                F.try_to_date(s).cast("timestamp"),
                F.try_to_date(s, "MM/dd/yyyy").cast("timestamp"),
                F.try_to_date(s, "yyyy/MM/dd").cast("timestamp"),
                F.try_to_date(s, "MMM d, yyyy").cast("timestamp"),
                F.try_to_date(s, "MMMM d, yyyy").cast("timestamp"),
                F.try_to_date(s, "d MMM yyyy").cast("timestamp"),
            )
            parseable = s.isNull() | parsed.isNotNull()
            aggs.append(_violations(parseable).alias(f"a{slot}"))
        elif etype == "expect_column_value_lengths_to_be_between":
            aggs.append(
                _violations(
                    _between(F.length(col), kw.get("min_value"), kw.get("max_value"))
                ).alias(f"a{slot}")
            )
        elif etype == "expect_column_values_to_be_in_set":
            aggs.append(_violations(col.isin(kw["value_set"])).alias(f"a{slot}"))
        elif etype == "expect_table_row_count_to_be_between":
            pass  # uses _rows
        elif etype == "expect_column_proportion_of_unique_values_to_be_between":
            aggs.append((F.countDistinct(col) / F.count(col)).alias(f"a{slot}"))
        elif etype == "expect_column_mean_to_be_between":
            aggs.append(F.avg(col).alias(f"a{slot}"))
        elif etype == "expect_column_values_to_match_regex":
            aggs.append(_violations(col.rlike(kw["regex"])).alias(f"a{slot}"))
        elif etype == "expect_column_values_to_not_match_regex":
            aggs.append(_violations(~col.rlike(kw["regex"])).alias(f"a{slot}"))
        elif etype == "expect_column_min_to_be_between":
            aggs.append(F.min(col).alias(f"a{slot}"))
        elif etype == "expect_column_max_to_be_between":
            aggs.append(F.max(col).alias(f"a{slot}"))
        elif etype == "expect_column_sum_to_be_between":
            aggs.append(F.sum(col).alias(f"a{slot}"))
        elif etype == "expect_column_stdev_to_be_between":
            aggs.append(F.stddev_samp(col).alias(f"a{slot}"))
        elif etype == "expect_column_distinct_values_to_be_in_set":
            aggs.append(
                F.array_sort(F.collect_set(F.when(~col.isin(kw["value_set"]), col)))
                .cast("string")
                .alias(f"a{slot}")
            )
        else:
            raise ValueError(f"unsupported expectation_type: {etype}")
        plans.append((slot, exp))

    row = df.agg(*aggs).collect()[0]
    results: list[ExpectationResult] = []
    for slot, exp in plans:
        etype = exp["expectation_type"]
        kw = exp.get("kwargs", {})
        col_name = kw.get("column")
        if slot == -1:  # column_to_exist
            ok = col_name in dtypes
            results.append(ExpectationResult(etype, col_name, ok, f"exists={ok}"))
        elif slot == -2:
            results.append(
                ExpectationResult(etype, col_name, False, "column missing")
            )
        elif slot == -3:  # type check — GE's pandas-dialect names
            type_map = {
                "float64": "double",
                "int64": "bigint",
                "object": "string",
                "datetime64[ns]": "timestamp",
            }
            want = type_map.get(kw["type_"], kw["type_"])
            got = dtypes.get(col_name)
            results.append(
                ExpectationResult(etype, col_name, got == want, f"type={got}")
            )
        elif etype == "expect_table_row_count_to_be_between":
            n = row["_rows"]
            ok = (kw.get("min_value") is None or n >= kw["min_value"]) and (
                kw.get("max_value") is None or n <= kw["max_value"]
            )
            results.append(ExpectationResult(etype, None, ok, f"rows={n}"))
        elif etype == "expect_column_proportion_of_unique_values_to_be_between":
            p = row[f"a{slot}"]
            ok = p is not None and kw["min_value"] <= p <= kw["max_value"]
            results.append(ExpectationResult(etype, col_name, bool(ok), f"proportion={p}"))
        elif etype == "expect_column_mean_to_be_between":
            m = row[f"a{slot}"]
            ok = m is not None and kw["min_value"] <= m <= kw["max_value"]
            results.append(ExpectationResult(etype, col_name, bool(ok), f"mean={m}"))
        elif etype in (
            "expect_column_min_to_be_between",
            "expect_column_max_to_be_between",
            "expect_column_sum_to_be_between",
            "expect_column_stdev_to_be_between",
        ):
            v = row[f"a{slot}"]
            ok = (
                v is not None
                and (kw.get("min_value") is None or v >= kw["min_value"])
                and (kw.get("max_value") is None or v <= kw["max_value"])
            )
            stat = etype.rsplit("_to_be_between", 1)[0].rsplit("_", 1)[-1]
            results.append(ExpectationResult(etype, col_name, bool(ok), f"{stat}={v}"))
        elif etype == "expect_column_distinct_values_to_be_in_set":
            extras = row[f"a{slot}"]
            ok = extras == "[]"
            results.append(
                ExpectationResult(etype, col_name, ok, f"unexpected={extras}")
            )
        else:
            v = row[f"a{slot}"]
            results.append(
                ExpectationResult(etype, col_name, v == 0, f"violations={v}")
            )
    return results


def evaluate_suite_file(df: DataFrame, path: str) -> list[ExpectationResult]:
    with open(path) as f:
        return evaluate_suite(df, json.load(f))


def report_df(spark: SparkSession, results: list[ExpectationResult]) -> DataFrame:
    return spark.createDataFrame(
        [(r.expectation_type, r.column, r.success, r.observed) for r in results],
        "expectation_type string, column string, success boolean, observed string",
    )


def dq_report_table(spark: SparkSession, df: DataFrame, suite: dict) -> DataFrame:
    """The D1-D11 report as a deterministic sorted TABLE (check_id,
    expectation_type, column_name, success) — every expectation in the
    reference suite is SQL-expressible, so the whole report is
    oracle-checkable (VERDICT r2 next-round #3). check_id is the
    1-based position in the suite file; the free-text ``observed``
    column of :func:`report_df` is dropped (float formatting is
    engine-specific, the booleans are the contract)."""
    results = evaluate_suite(df, suite)
    rows = [
        (i + 1, r.expectation_type, r.column, bool(r.success))
        for i, r in enumerate(results)
    ]
    return spark.createDataFrame(
        rows,
        "check_id int, expectation_type string, column_name string, success boolean",
    ).orderBy("check_id")
