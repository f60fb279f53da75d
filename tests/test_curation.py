"""End-to-end curation pipeline: funnel consistency, audit
completeness, transactional idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakeflow.ext import curation
from lakeflow.txlog import TxTable


def test_curate_funnel_and_audit(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    summary = curation.curate(spark, sf_dir, out, batch_id=1)

    # funnel is monotone and non-degenerate (every gate trims a tail,
    # none wipes the corpus)
    assert (
        summary["input_docs"]
        >= summary["after_exact_dedup"]
        >= summary["after_decontam"]
        >= summary["after_quality"]
        >= summary["after_model"]
        >= summary["after_span_dedup"]
        >= summary["kept"]
        > 0
    )
    assert summary["kept"] >= summary["input_docs"] * 0.25
    assert summary["splits"] >= 2

    flagged = TxTable(out).read(spark)
    # audit completeness: one row per input doc, rejected rows kept
    assert flagged.count() == summary["input_docs"]
    # every kept doc has a split and a shard
    kept = flagged.filter("kept")
    assert kept.filter(F.col("split").isNull() | F.col("shard_id").isNull()).count() == 0
    # the funnel numbers are reproducible from the audit table
    assert kept.count() == summary["kept"]


def test_curate_is_idempotent_per_batch(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    s1 = curation.curate(spark, sf_dir, out, batch_id=7)
    v1 = TxTable(out).latest_version()
    s2 = curation.curate(spark, sf_dir, out, batch_id=7)  # scheduler retry
    v2 = TxTable(out).latest_version()
    assert s1 == s2
    assert v1 == v2  # no duplicate commit
    # a NEW batch does commit
    s3 = curation.curate(spark, sf_dir, out, batch_id=8)
    assert TxTable(out).latest_version() > v2
    assert s3 == s1


def test_curate_no_leakage_through_split(spark, sf_dir, tmp_path):
    """Kept docs inherit the cluster-keyed split: every kept doc's
    split must equal the split its dedup cluster was assigned."""
    from lakeflow.ext.dedup import cluster_split

    out = str(tmp_path / "curated")
    curation.curate(spark, sf_dir, out, batch_id=1)
    flagged = TxTable(out).read(spark).filter("kept")
    cl = cluster_split(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), F.col("split").alias("cl_split")
    )
    joined = flagged.join(cl, "doc_id")
    assert joined.filter(F.col("split") != F.col("cl_split")).count() == 0


def test_diff_runs_transition_matrix(spark, sf_dir, tmp_path):
    """Two runs with different quality gates: the diff classifies every
    movement, totals reconcile with the audits, and newly-dropped docs
    carry the gate that dropped them."""
    out = str(tmp_path / "curated")
    curation.curate(spark, sf_dir, out, batch_id=1)
    v0 = TxTable(out).latest_version()
    # stricter repetition cap drops more docs
    s2 = curation.curate(
        spark, sf_dir, out, batch_id=2, rep_token_max=0.5
    )
    v1 = TxTable(out).latest_version()
    assert v1 > v0

    diff = {
        (r["transition"], r["gate_new"]): r["docs"]
        for r in curation.diff_runs(spark, out, v0, v1).collect()
    }
    total = sum(diff.values())
    assert total == s2["input_docs"]  # every doc classified exactly once
    dropped = {k: v for k, v in diff.items() if k[0] == "newly_dropped"}
    assert dropped, "stricter gate dropped nobody — test data drifted?"
    # a tightened QUALITY gate must be the reason for the new drops
    assert all(gate == "quality" for (_, gate) in dropped)
    assert ("kept_both", "kept") in diff


def test_embedding_less_docs_get_split(spark, sf_dir, tmp_path):
    """ADVICE r4: at sf1 only 20k of 50k docs carry an embedding row;
    docs without one used to be kept (keep_canonical coalesced True)
    with a NULL split. Build a docs>embeddings fixture by truncating
    the embeddings table and assert EVERY kept doc has a split, and
    that the fallback split is the doc-keyed md5 bucket (stable,
    engine-portable) rather than anything positional."""
    import os

    import pyarrow.parquet as pq

    fix = tmp_path / "sf_fixture"
    fix.mkdir()
    for name in ("documents", "embeddings"):
        src = os.path.join(sf_dir, f"{name}.parquet")
        if name == "embeddings":
            t = pq.read_table(src)
            pq.write_table(t.slice(0, max(1, t.num_rows // 2)), fix / "embeddings.parquet")
        else:
            os.symlink(src, fix / f"{name}.parquet")

    flagged = curation.curated_docs(spark, str(fix))
    kept = flagged.filter("kept").persist()
    assert kept.count() > 0
    assert kept.filter(F.col("split").isNull()).count() == 0
    # fallback split matches the doc-keyed md5 bucket thresholds
    from lakeflow.ext.sampling import _bucket

    emb_ids = {
        r[0]
        for r in spark.read.parquet(str(fix / "embeddings.parquet"))
        .select("vec_id")
        .collect()
    }
    b = _bucket(F.col("doc_id"))
    expect = F.when(b < 204, "train").when(b < 230, "val").otherwise("test")
    orphans = kept.filter(~F.col("doc_id").isin(list(emb_ids)))
    assert orphans.count() > 0, "fixture failed to orphan any kept doc"
    assert orphans.filter(F.col("split") != expect).count() == 0
    kept.unpersist()
