"""Sampling operators for training-data pipelines.

Three samplers with different determinism/scale trade-offs:

- :func:`hash_sample` / :func:`train_test_split` — CONTENT-HASH
  sampling: membership is a pure function of the row key (md5 hex
  prefix), so the sample is reproducible across engines, runs, and
  repartitioning, rows can be assigned to splits with no RNG state,
  and late-arriving data lands in the same split forever. This is the
  right default for 100 TB training corpora (no seed coordination
  across executors, no sampling drift between pipeline runs) and it is
  exactly mirrorable in SQL → oracle-checked.
- :func:`stratified_sample` — Spark's ``sampleBy`` (per-stratum
  Bernoulli): cheap one-pass, but engine-RNG-specific → rows-only,
  property-tested (per-class proportions within binomial tolerance).

No shuffles anywhere: all three are scan + filter/project; the hash
samplers push nothing BUT a cheap md5-prefix predicate below the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakeflow import io


def _bucket(key: F.Column, buckets: int = 256) -> F.Column:
    """Stable [0, buckets) bucket from the md5 hex prefix of a key —
    identical in any engine with md5 (two lowercase hex chars = 256
    buckets; conv() exists in Spark but not DuckDB, string compare and
    unhex-free arithmetic keep the expression portable)."""
    hx = F.substring(F.md5(key.cast("string")), 1, 2)
    digit = lambda c: F.instr(F.lit("0123456789abcdef"), c) - 1  # noqa: E731
    return digit(F.substring(hx, 1, 1)) * 16 + digit(F.substring(hx, 2, 1))


def hash_sample(
    df: DataFrame, key: str, fraction_256: int = 51
) -> DataFrame:
    """Deterministic ~(fraction_256/256) sample: keep rows whose key
    hashes into the first ``fraction_256`` of 256 md5 buckets."""
    return df.filter(_bucket(F.col(key)) < fraction_256)


def sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: deterministic 51/256 (~20%) document sample."""
    docs = io.read_table(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id").select("doc_id", "lang", "source").orderBy("doc_id")


SAMPLE_DOCS_SQL = """
WITH b AS (
    SELECT doc_id, lang, source,
           (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
    FROM documents
)
SELECT doc_id, lang, source FROM b WHERE bucket < 51 ORDER BY doc_id
"""


def train_test_split(
    spark: SparkSession, sf_dir: str, test_256: int = 26, val_256: int = 26
) -> DataFrame:
    """Reproducible 3-way split by content hash: buckets [0, test) →
    test, [test, test+val) → val, rest → train. Returns per-split ×
    per-lang counts (the assignment audit a training pipeline logs)."""
    docs = io.read_table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    split = (
        F.when(b < test_256, "test")
        .when(b < test_256 + val_256, "val")
        .otherwise("train")
    )
    return (
        docs.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count("*").alias("docs"))
        .orderBy("split", "lang")
    )


TRAIN_TEST_SPLIT_SQL = """
WITH b AS (
    SELECT lang,
           (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
    FROM documents
)
SELECT CASE WHEN bucket < 26 THEN 'test'
            WHEN bucket < 52 THEN 'val'
            ELSE 'train' END AS split,
       lang, COUNT(*) AS docs
FROM b GROUP BY 1, 2 ORDER BY 1, 2
"""


def stratified_sample(
    spark: SparkSession,
    sf_dir: str,
    fractions: dict[str, float] | None = None,
    default_fraction: float = 0.2,
) -> DataFrame:
    """Per-stratum deterministic sample over documents: keep a row iff
    the 16-bit md5 prefix of (lang ':' doc_id) falls under the
    stratum's threshold. Same per-class Bernoulli statistics as
    ``sampleBy`` but membership is a pure function of the row — no
    engine RNG, no seed coordination across executors, reproducible
    across engines → oracle-checkable (VERDICT r2 next-round #3).

    Salting the hash with the stratum makes per-stratum draws
    independent: a document sampled for one lang's stratum says nothing
    about its fate under another fraction. One pass, no shuffle; the
    distinct-langs discovery job of the old sampleBy form is gone.
    """
    docs = io.read_table(spark, sf_dir, "documents")
    hx = F.md5(F.concat(F.col("lang"), F.lit(":"), F.col("doc_id").cast("string")))
    h16 = F.conv(F.substring(hx, 1, 4), 16, 10).cast("bigint")
    if fractions:
        ladder = F.lit(0)
        for lang, frac in sorted(fractions.items()):
            ladder = F.when(F.col("lang") == lang, int(frac * 65536)).otherwise(ladder)
        threshold = ladder
    else:
        threshold = F.lit(int(default_fraction * 65536))
    return (
        docs.filter(h16 < threshold)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


STRATIFIED_SAMPLE_SQL = """
WITH h AS (
    SELECT doc_id, lang, source,
           (  (strpos('0123456789abcdef', substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1)
           ) AS h16
    FROM documents
)
SELECT doc_id, lang, source FROM h WHERE h16 < 13107 ORDER BY doc_id
"""


def weighted_sample(spark: SparkSession, sf_dir: str, k: int = 50) -> DataFrame:
    """Reproducible weighted sampling: top-k documents by the priority
    h(key) / weight (A-Res shape with a hash-derived uniform), weight =
    document length — longer docs proportionally likelier, yet the
    draw is a pure function of doc_id so it is re-runnable, auditable,
    and oracle-checkable (no engine RNG).

    Integer-only arithmetic (16-bit hash value, integer-scaled
    division) — no transcendental functions whose last-ulp differences
    between libm implementations could flip a rank at the selection
    boundary. TakeOrderedAndProject keeps it one pass, no global sort.
    """
    docs = io.read_table(spark, sf_dir, "documents")
    hx = F.md5(F.col("doc_id").cast("string"))
    h16 = F.conv(F.substring(hx, 1, 4), 16, 10).cast("bigint")
    # bigint `div` (not `/` + cast: a float quotient within half an ulp
    # below an integer would round up and truncate to the wrong floor)
    priority = F.expr("(h16 * 1000000L) div n_chars")
    return (
        docs.select("doc_id", "lang", "n_chars", h16.alias("h16"))
        .select("doc_id", "lang", "n_chars", priority.alias("priority"))
        .orderBy("priority", "doc_id")
        .limit(k)
    )


WEIGHTED_SAMPLE_SQL = """
WITH h AS (
    SELECT doc_id, lang, n_chars,
           (  (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)
           ) AS h16
    FROM documents
)
SELECT doc_id, lang, n_chars,
       CAST(h16 * 1000000 // n_chars AS BIGINT) AS priority
FROM h
ORDER BY priority, doc_id
LIMIT 50
"""


def capped_sample(spark: SparkSession, sf_dir: str, cap: int = 8) -> DataFrame:
    """Per-stratum capped sampling: keep at most ``cap`` documents per
    (lang, source) stratum, chosen by hash priority — the curation
    primitive that stops a dominant source from flooding a training
    mix while staying reproducible (membership is a pure function of
    doc_id, not engine RNG).

    One shuffle on the stratum key; the per-stratum rank is a window
    over md5 priority with a doc_id tie-break (total order → the same
    cap set on any cluster layout).
    """
    docs = io.read_table(spark, sf_dir, "documents")
    pri = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang", "source").orderBy(pri, F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= cap)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


CAPPED_SAMPLE_SQL = """
SELECT doc_id, lang, source FROM (
    SELECT doc_id, lang, source,
           row_number() OVER (PARTITION BY lang, source
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM documents
)
WHERE rk <= 8
ORDER BY doc_id
"""
