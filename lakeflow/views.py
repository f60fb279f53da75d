"""Gold-tier analytic views — DataFrame builders over silver claims.

Each function reproduces one reference view or check query:
- claims_summary        → /root/reference/sql/gold/create_views.sql:8-29
- monthly_trend         → :32-51
- provider_performance  → :54-72
- quality_dashboard     → :75-97
- member_activity       → :100-117
- recent_activity       → :120-159 (wall-clock NOW pinned; see claims.py)
- category_distribution → /root/reference/sql/trino_checks.sql:126-134
- quality_distribution  → :137-155
- data_issues           → :157-166
- table_stats           → :112-123
- topk_newest           → :29-42

Hash-stability deviations from the reference (documented per SURVEY.md
§7.3): every AVG over the {0.3,0.5,0.7,1.0} quality score is rounded to
3 decimals on BOTH engine and oracle sides (the reference leaves one
unrounded, create_views.sql:20) because float summation order is not
associative; claim_amount aggregates need no rounding — the derived
amounts are integer-valued doubles, so their sums are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GOLD_CUTOFF = "2023-01-01"


def _hv(col: str = "claim_amount_category") -> F.Column:
    """COUNT(CASE WHEN category IN ('HIGH','VERY_HIGH') THEN 1 END)."""
    return F.count(F.when(F.col(col).isin("HIGH", "VERY_HIGH"), 1))


def _avg_exact(col: str, alias: str) -> F.Column:
    """Order-independent AVG for integer-valued doubles: exact SUM then
    one division — bit-identical across engines."""
    return (F.sum(col) / F.count(col)).alias(alias)


def _avg_score(alias: str = "avg_quality_score") -> F.Column:
    """ROUND(AVG(data_quality_score), 3), order-independent.

    Scores are in {0.5, 0.7, 1.0}; ×10 each is an exact IEEE integer
    (0.7*10 rounds to exactly 7.0), so the sum is exact and the single
    division is bit-identical across engines and partitionings.
    """
    c = F.col("data_quality_score")
    return F.round(F.sum(c * 10) / (F.count(c) * 10), 3).alias(alias)


def claims_summary(silver: DataFrame) -> DataFrame:
    return (
        silver.filter(F.col("service_date") >= F.lit(GOLD_CUTOFF).cast("date"))
        .groupBy("service_year", "service_month", "provider_name", "claim_amount_category")
        .agg(
            F.count("*").alias("total_claims"),
            F.countDistinct("member_id").alias("unique_members"),
            F.sum("claim_amount").alias("total_amount"),
            _avg_exact("claim_amount", "avg_claim_amount"),
            F.min("claim_amount").alias("min_claim_amount"),
            F.max("claim_amount").alias("max_claim_amount"),
            _avg_score(),
            F.count(F.when(F.col("data_quality_score") >= 0.8, 1)).alias(
                "high_quality_claims"
            ),
            F.max("processing_timestamp").alias("last_processed"),
        )
    )


def monthly_trend(silver: DataFrame) -> DataFrame:
    return (
        silver.filter(F.col("service_date") >= F.lit(GOLD_CUTOFF).cast("date"))
        .groupBy("service_year", "service_month")
        .agg(
            F.make_date("service_year", "service_month", F.lit(1)).alias("month_date"),
            F.count("*").alias("claims_count"),
            F.countDistinct("member_id").alias("unique_members"),
            F.sum("claim_amount").alias("total_amount"),
            _avg_exact("claim_amount", "avg_amount"),
            F.count(F.when(F.col("claim_amount_category") == "HIGH", 1)).alias(
                "high_value_claims"
            ),
            F.count(F.when(F.col("claim_amount_category") == "VERY_HIGH", 1)).alias(
                "very_high_value_claims"
            ),
            _avg_score(),
        )
        .orderBy(F.desc("service_year"), F.desc("service_month"))
    )


def provider_performance(silver: DataFrame, min_claims: int = 10) -> DataFrame:
    return (
        silver.filter(F.col("provider_name") != "UNKNOWN")
        .groupBy("provider_name")
        .agg(
            F.count("*").alias("total_claims"),
            F.countDistinct("member_id").alias("unique_members"),
            F.sum("claim_amount").alias("total_billed"),
            _avg_exact("claim_amount", "avg_claim_amount"),
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY claim_amount)"
            ).alias("median_claim_amount"),
            _hv().alias("high_value_claims"),
            F.round(_hv() * 100.0 / F.count("*"), 2).alias("high_value_percentage"),
            _avg_score(),
            F.min("service_date").alias("first_service_date"),
            F.max("service_date").alias("last_service_date"),
            F.countDistinct(
                F.make_date("service_year", "service_month", F.lit(1))
            ).alias("active_months"),
        )
        .filter(F.col("total_claims") >= min_claims)
        .orderBy(F.desc("total_billed"))
    )


def quality_dashboard(silver: DataFrame) -> DataFrame:
    s = F.col("data_quality_score")
    return (
        silver.groupBy("service_year", "service_month")
        .agg(
            F.count("*").alias("total_records"),
            F.count(F.when(s >= 0.9, 1)).alias("excellent_quality"),
            F.count(F.when((s >= 0.7) & (s < 0.9), 1)).alias("good_quality"),
            F.count(F.when((s >= 0.5) & (s < 0.7), 1)).alias("fair_quality"),
            F.count(F.when(s < 0.5, 1)).alias("poor_quality"),
            _avg_score(),
            F.round(F.count(F.when(s >= 0.8, 1)) * 100.0 / F.count("*"), 2).alias(
                "high_quality_percentage"
            ),
            F.count(F.when(F.col("claim_id").isNull(), 1)).alias("missing_claim_id"),
            F.count(F.when(F.col("member_id").isNull(), 1)).alias("missing_member_id"),
            F.count(F.when(F.col("service_date").isNull(), 1)).alias(
                "missing_service_date"
            ),
            F.count(
                F.when(F.col("claim_amount").isNull() | (F.col("claim_amount") <= 0), 1)
            ).alias("invalid_amount"),
            F.max("processing_timestamp").alias("last_processed"),
        )
        .orderBy(F.desc("service_year"), F.desc("service_month"))
    )


def member_activity(silver: DataFrame, min_claims: int = 2) -> DataFrame:
    return (
        silver.filter(F.col("member_id").isNotNull())
        .groupBy("member_id")
        .agg(
            F.count("*").alias("total_claims"),
            F.sum("claim_amount").alias("total_amount"),
            _avg_exact("claim_amount", "avg_claim_amount"),
            F.countDistinct("provider_name").alias("providers_used"),
            _hv().alias("high_value_claims"),
            F.min("service_date").alias("first_service_date"),
            F.max("service_date").alias("last_service_date"),
            _avg_score(),
            F.datediff(F.max("service_date"), F.min("service_date")).alias(
                "activity_span_days"
            ),
            F.countDistinct(
                F.make_date("service_year", "service_month", F.lit(1))
            ).alias("active_months"),
        )
        .filter(F.col("total_claims") >= min_claims)
        .orderBy(F.desc("total_amount"))
    )


def _recent_branch(silver: DataFrame, label: str, days: int, now_spark: str) -> DataFrame:
    cutoff = F.expr(f"{now_spark} - make_interval(0, 0, 0, {days}, 0, 0, 0)")
    return silver.filter(F.col("processing_timestamp") >= cutoff).agg(
        F.lit(label).alias("period"),
        F.count("*").alias("claims_processed"),
        F.countDistinct("member_id").alias("unique_members"),
        F.countDistinct("provider_name").alias("unique_providers"),
        F.sum("claim_amount").alias("total_amount"),
        _avg_exact("claim_amount", "avg_amount"),
        _avg_score("avg_quality"),
        F.max("processing_timestamp").alias("last_update"),
    )


def recent_activity(silver: DataFrame, now_spark: str) -> DataFrame:
    """3-branch UNION ALL over recency windows (U1).

    ``now`` is injectable (pinned for oracle determinism; pass
    ``current_timestamp()`` for production wall-clock semantics).
    """
    return (
        _recent_branch(silver, "Last 30 Days", 30, now_spark)
        .unionAll(_recent_branch(silver, "Last 7 Days", 7, now_spark))
        .unionAll(_recent_branch(silver, "Last 24 Hours", 1, now_spark))
    )


def category_distribution(silver: DataFrame) -> DataFrame:
    total = Window.partitionBy()
    return (
        silver.groupBy("claim_amount_category")
        .agg(F.count("*").alias("count"), F.sum("claim_amount").alias("total_amount"))
        .withColumn(
            "percentage",
            F.round(F.col("count") * 100.0 / F.sum("count").over(total), 2),
        )
        .select("claim_amount_category", "count", "percentage", "total_amount")
        .orderBy(F.desc("count"))
    )


def quality_distribution(silver: DataFrame) -> DataFrame:
    s = F.col("data_quality_score")
    banded = silver.withColumn(
        "quality_range",
        F.when(s >= 0.9, "Excellent (0.9-1.0)")
        .when(s >= 0.7, "Good (0.7-0.89)")
        .when(s >= 0.5, "Fair (0.5-0.69)")
        .otherwise("Poor (<0.5)"),
    )
    total = Window.partitionBy()
    return (
        banded.groupBy("quality_range")
        .agg(F.count("*").alias("count"))
        .withColumn(
            "percentage",
            F.round(F.col("count") * 100.0 / F.sum("count").over(total), 2),
        )
        .orderBy(F.desc("count"))
    )


def data_issues(silver: DataFrame) -> DataFrame:
    def flag(cond: F.Column, alias: str) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).alias(alias)

    return silver.agg(
        flag(F.col("claim_id").isNull(), "null_claim_ids"),
        flag(F.col("member_id").isNull(), "null_member_ids"),
        flag(F.col("service_date").isNull(), "null_service_dates"),
        flag(
            F.col("claim_amount").isNull() | (F.col("claim_amount") < 0),
            "invalid_amounts",
        ),
        flag(F.col("provider_name") == "UNKNOWN", "unknown_providers"),
        F.count("*").alias("total_records"),
    )


def table_stats(silver: DataFrame) -> DataFrame:
    return silver.agg(
        F.count("*").alias("total_rows"),
        F.countDistinct("member_id").alias("unique_members"),
        F.countDistinct("provider_name").alias("unique_providers"),
        F.min("service_date").alias("earliest_service"),
        F.max("service_date").alias("latest_service"),
        F.min("processing_timestamp").alias("first_processed"),
        F.max("processing_timestamp").alias("last_processed"),
    )


def topk_newest(silver: DataFrame, k: int = 5) -> DataFrame:
    """O3 — newest-k claims; claim_id tiebreak keeps the row SET
    deterministic (processing_timestamp has few distinct values).
    Spark plans this as TakeOrderedAndProject — no full sort."""
    return (
        silver.select(
            "claim_id",
            "member_id",
            "provider_name",
            "claim_amount",
            "service_date",
            "claim_amount_category",
            "data_quality_score",
            "processing_timestamp",
        )
        .orderBy(F.desc("processing_timestamp"), F.asc("claim_id"))
        .limit(k)
    )


def median_by_group(silver: DataFrame) -> DataFrame:
    """A6 — exact discrete median per provider: PERCENTILE_DISC(0.5)
    WITHIN GROUP, the reference's only percentile
    (/root/reference/sql/gold/create_views.sql:61). PERCENTILE_DISC
    returns an actual data value (no interpolation) — the SURVEY §7.3
    semantic trap; the oracle mirrors it with DuckDB's quantile_disc."""
    return (
        silver.filter(F.col("provider_name") != "UNKNOWN")
        .groupBy("provider_name")
        .agg(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY claim_amount)"
            ).alias("median_claim_amount"),
            F.count("*").alias("total_claims"),
        )
        .orderBy("provider_name")
    )


def dq_aggregates(silver: DataFrame) -> DataFrame:
    """§2.9 scalar reductions of the DQ suite (D2-D4, D7, D8, D10, D11)
    as one oracle-checkable aggregate row — the SQL-expressible core of
    q_dq_report (/root/reference/dq/expectations/silver_claims.json)."""
    amount = F.col("claim_amount")
    score = F.col("data_quality_score")
    sdate = F.col("service_date")
    plen = F.length("provider_name")
    cats = ("ZERO", "LOW", "MEDIUM", "HIGH", "VERY_HIGH")
    return silver.agg(
        F.count(F.when(F.col("claim_id").isNull(), 1)).alias("null_claim_ids"),
        F.count(F.when(F.col("member_id").isNull(), 1)).alias("null_member_ids"),
        F.count(F.when(F.col("provider_name").isNull(), 1)).alias("null_providers"),
        F.count(F.when(~amount.between(0.0, 1_000_000.0), 1)).alias(
            "amount_range_violations"
        ),
        F.count(F.when(~score.between(0.0, 1.0), 1)).alias("score_range_violations"),
        F.count(
            F.when(
                ~sdate.between(
                    F.lit("2020-01-01").cast("date"), F.lit("2030-12-31").cast("date")
                ),
                1,
            )
        ).alias("date_range_violations"),
        F.count(F.when(~plen.between(1, 100), 1)).alias("provider_len_violations"),
        F.count(F.when(~F.col("claim_amount_category").isin(*cats), 1)).alias(
            "category_violations"
        ),
        F.round(F.countDistinct("claim_id") / F.count("*"), 6).alias(
            "claim_id_unique_ratio"
        ),
        _avg_score("mean_quality_score"),
        F.count("*").alias("total_rows"),
    )


CATEGORY_ORDER = ("ZERO", "LOW", "MEDIUM", "HIGH", "VERY_HIGH")


def pivot_category_amounts(silver: DataFrame) -> DataFrame:
    """Wide month × category amount matrix via ``pivot`` with EXPLICIT
    pivot values — the values list matters at scale: without it Spark
    runs an extra distinct-collect job over the fact table to discover
    the columns. Equivalent to five conditional sums (the SQL mirror),
    which is exactly the physical plan pivot compiles to: one partial+
    final hash aggregate, no extra shuffle versus a plain groupBy."""
    wide = (
        silver.groupBy("service_year", "service_month")
        .pivot("claim_amount_category", list(CATEGORY_ORDER))
        .agg(F.sum(F.col("claim_amount").cast("decimal(18,2)")))
    )
    cols = [
        F.coalesce(F.col(c).cast("double"), F.lit(0.0)).alias(f"{c.lower()}_amount")
        for c in CATEGORY_ORDER
    ]
    return wide.select("service_year", "service_month", *cols).orderBy(
        "service_year", "service_month"
    )
