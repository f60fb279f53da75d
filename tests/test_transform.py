"""Unit tests for the silver cleaning operators — semantics pinned to
/root/reference/jobs/silver/claims_to_iceberg.py:45-88."""

from __future__ import annotations

import datetime as dt

from lakeflow import transform


def _raw(spark, rows):
    return spark.createDataFrame(
        rows,
        "claim_id string, member_id string, provider_name string, "
        "claim_amount double, service_date string",
    )


def test_clean_claims_full_semantics(spark):
    rows = [
        # clean row, every field well-formed
        ("CLM1", "MBR1", "Clinic a", 50.0, "2024-03-01"),
        # null claim_id → dropped by P2
        (None, "MBR1", "Clinic a", 10.0, "2024-03-01"),
        # padded ids trimmed; provider upper-cased
        ("  CLM2 ", " MBR2 ", "  clinic b ", 150.0, "03/15/2024"),
        # blank provider → UNKNOWN; negative amount → 0.0 → score 0.7
        ("CLM3", "MBR3", "   ", -5.0, "15/03/2024"),
        # null provider → UNKNOWN; null amount → 0.0
        ("CLM4", "MBR4", None, None, "2024-12-31"),
        # bad date → NULL service_date → score 0.5
        ("CLM5", "MBR5", "Clinic C", 2000.0, "not-a-date"),
        # null member → score 0.3 → filtered by quality gate
        ("CLM6", None, "Clinic C", 99.0, "2024-01-01"),
        # very high amount band
        ("CLM7", "MBR7", "Clinic D", 123456.0, "2024-06-30"),
    ]
    out = transform.clean_claims(_raw(spark, rows))
    got = {r["claim_id"]: r.asDict() for r in out.collect()}

    assert set(got) == {"CLM1", "CLM2", "CLM3", "CLM4", "CLM5", "CLM7"}
    assert got["CLM2"]["member_id"] == "MBR2"
    assert got["CLM2"]["provider_name"] == "CLINIC B"
    assert got["CLM2"]["service_date"] == dt.date(2024, 3, 15)
    assert got["CLM3"]["provider_name"] == "UNKNOWN"
    assert got["CLM3"]["claim_amount"] == 0.0
    assert got["CLM3"]["claim_amount_category"] == "ZERO"
    assert got["CLM3"]["data_quality_score"] == 0.7
    assert got["CLM3"]["service_date"] == dt.date(2024, 3, 15)  # dd/MM fallback
    assert got["CLM4"]["provider_name"] == "UNKNOWN"
    assert got["CLM4"]["claim_amount"] == 0.0
    assert got["CLM5"]["service_date"] is None
    assert got["CLM5"]["data_quality_score"] == 0.5
    assert got["CLM5"]["service_year"] is None
    assert got["CLM1"]["claim_amount_category"] == "LOW"
    assert got["CLM2"]["claim_amount_category"] == "MEDIUM"
    assert got["CLM5"]["claim_amount_category"] == "HIGH"
    assert got["CLM7"]["claim_amount_category"] == "VERY_HIGH"
    assert got["CLM1"]["data_quality_score"] == 1.0
    assert got["CLM1"]["service_year"] == 2024
    assert got["CLM1"]["service_month"] == 3
    assert got["CLM1"]["service_day"] == 1


def test_quality_gate_equals_score_threshold(spark):
    """clean_claims filters on raw member_id (pushdown-friendly); that
    must select EXACTLY the rows the reference's score >= 0.5 gate
    selects (claims_to_iceberg.py:85) — the 0.0/0.3 rungs are the only
    sub-threshold scores and both are null-key rows."""
    rows = [
        ("C1", "M1", "P", 10.0, "2024-01-01"),   # 1.0
        ("C2", None, "P", 10.0, "2024-01-01"),   # 0.3 → dropped
        ("C3", "M3", "P", 10.0, "bad-date"),     # 0.5 → kept
        ("C4", "M4", "P", -1.0, "2024-01-01"),   # 0.7 (clamped) → kept
        (None, "M5", "P", 10.0, "2024-01-01"),   # dropped by P2
    ]
    got = transform.clean_claims(_raw(spark, rows))
    # reference formulation: the SAME shipped pre-gate chain, gated on
    # the derived score (no duplicated ladder that could drift)
    naive = transform.threshold_filter(
        transform.clean_claims_scored(_raw(spark, rows)), "data_quality_score", 0.5
    )
    assert sorted(r.claim_id for r in got.collect()) == sorted(
        r.claim_id for r in naive.collect()
    ) == ["C1", "C3", "C4"]


def test_ambiguous_date_prefers_mm_dd(spark):
    # 03/04/2024 parses under both MM/dd and dd/MM → first format wins
    out = transform.clean_claims(
        _raw(spark, [("C1", "M1", "P", 1.0, "03/04/2024")])
    ).collect()[0]
    assert out["service_date"] == dt.date(2024, 3, 4)


def test_band_boundaries(spark):
    rows = [
        ("A", "M", "P", 0.0, "2024-01-01"),
        ("B", "M", "P", 100.0, "2024-01-01"),
        ("C", "M", "P", 100.01, "2024-01-01"),
        ("D", "M", "P", 1000.0, "2024-01-01"),
        ("E", "M", "P", 10000.0, "2024-01-01"),
        ("F", "M", "P", 10000.01, "2024-01-01"),
    ]
    out = transform.clean_claims(_raw(spark, rows))
    cats = {r["claim_id"]: r["claim_amount_category"] for r in out.collect()}
    assert cats == {
        "A": "ZERO",
        "B": "LOW",
        "C": "MEDIUM",
        "D": "MEDIUM",
        "E": "HIGH",
        "F": "VERY_HIGH",
    }
