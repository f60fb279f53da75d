"""r12 cold-path optimization (guide §7.3): the batched selectExpr
builders for claims_raw / silver_claims must be row-for-row and
schema-identical to the Column-API operator composition they replace.
The composition stays in the tree as the spec; this pin means the fast
path can never drift from it."""

from __future__ import annotations

from lakeflow import claims


def _rows(df):
    return sorted(map(tuple, df.collect()), key=repr)


def test_claims_raw_fast_matches_column_spec(spark, sf_dir):
    fast = claims._claims_raw_build(spark, sf_dir)
    spec = claims._claims_raw_build_columns(spark, sf_dir)
    assert [(f.name, f.dataType) for f in fast.schema.fields] == [
        (f.name, f.dataType) for f in spec.schema.fields
    ]
    assert _rows(fast) == _rows(spec)


def test_silver_fast_matches_operator_composition(spark, sf_dir):
    fast = claims._silver_claims_build(spark, sf_dir)
    spec = claims._silver_claims_build_columns(spark, sf_dir)
    assert [(f.name, f.dataType) for f in fast.schema.fields] == [
        (f.name, f.dataType) for f in spec.schema.fields
    ]
    assert _rows(fast) == _rows(spec)
