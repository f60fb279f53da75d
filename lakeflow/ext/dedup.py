"""Deduplication operators over `documents` (X1/X2 + training-data
pipeline surface): exact, MinHash+LSH near-dup, SimHash, n-gram
Jaccard.

Scale design:
- Exact dedup is a hash groupBy on a fingerprint — one shuffle on an
  evenly-distributed md5 key; keeps min(doc_id) deterministically
  (dropDuplicates would keep an arbitrary row).
- MinHash/LSH: shingle → K minhashes → B bands → self-join on
  (band_id, band_hash) buckets → verify candidate pairs with exact
  Jaccard. The cross-product only happens WITHIN buckets, which is the
  100 TB-safe shape (no global O(n²)). All built-in expressions
  (array/higher-order functions + murmur hash) — no Python in the path.
- SimHash: 64-bit sign-aggregated token hashes via bitwise built-ins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeflow import io

NORM = "[^a-z0-9 ]"


def _norm_text(col: str = "text") -> F.Column:
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(F.col(col)), NORM, ""), r"\s+", " ")
    )


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 — exact dedup groups on normalized-text fingerprint; emits one
    row per distinct content with the deterministic survivor (min id)."""
    # the normalized tier: md5 on the stored norm column, no regex re-run
    # (no null texts exist at any SF — the tier's isNotNull filter is a
    # no-op; verified, and pinned by the oracle row counts)
    docs = normalized_docs(spark, sf_dir)
    return (
        docs.select(F.md5("norm").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("copies"))
        .orderBy("fingerprint")
    )


EXACT_DEDUP_SQL = r"""
SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), '\s+', ' ', 'g'))) AS fingerprint,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS copies
FROM documents
WHERE text IS NOT NULL  -- the normalized tier's filter (null = no content to dedup)
GROUP BY 1 ORDER BY 1
"""


def _shingles(tokens: F.Column, n: int = 3) -> F.Column:
    """n-gram shingles of a token array via sequence + transform
    (built-in higher-order functions, no UDF).

    PERF TRAP: ``tokens`` must be a materialized COLUMN REFERENCE, not
    an inline expression — higher-order lambdas re-evaluate captured
    expressions per element, so passing ``split(regexp_replace(...))``
    directly makes the regex run once per shingle index = O(len²) per
    document. Use :func:`tokenized` to stage the token array first.
    """
    idx = F.sequence(F.lit(0), F.greatest(F.size(tokens) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)))
    )


def normalized_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with a materialized ``norm`` column (lowercase, alnum,
    single-spaced) — the normalized-text TIER every text operator shares,
    cached MEMORY_AND_DISK like the silver claims tier (CacheManager
    dedupes the identical plan across calls, so the regex chain runs once
    per session, not once per query).

    Why a tier and not an expression: Catalyst pushes filters through
    projections by ALIAS SUBSTITUTION, so any query that filters on a
    column derived from the normalization chain re-evaluates the whole
    chain once per consumer (pushed cache-scan predicate + Filter +
    Project = 3×), and nondeterministic-conjunct barriers don't stop the
    deterministic part being split out and pushed. Materializing the
    normalized text makes the pushed predicates operate on a stored
    column instead — measured at sf1 this took q_contamination 6.6 s →
    0.35 s and q_bm25 8.6 s → 1.0 s. At 100 TB this tier is exactly the
    normalize-once medallion layer a curation pipeline would persist
    between its bronze text and every downstream filter/dedup stage."""
    from lakeflow.plancache import tier

    def build() -> DataFrame:
        from pyspark import StorageLevel

        docs = io.read_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull()
        )
        return docs.withColumn("norm", _norm_text()).persist(
            StorageLevel.MEMORY_AND_DISK
        )

    # plan-memoized per (session, sf_dir) — same rationale and identical
    # semantics as the silver-claims memo (lakeflow.plancache)
    return tier(spark, ("normalized_docs", sf_dir), build)


def tokenized(docs: DataFrame, *keep: str) -> DataFrame:
    """doc_id (+ ``keep`` passthrough cols) + normalized token array,
    staged as its own projection so downstream lambdas see a cheap
    attribute reference (see _shingles perf note). When ``docs`` comes
    from :func:`normalized_docs` the stored ``norm`` column is split
    instead of re-running the regex chain (identical result: ``norm``
    IS ``_norm_text``'s output)."""
    src = F.col("norm") if "norm" in docs.columns else _norm_text()
    return docs.select("doc_id", *keep, F.split(src, r"\s+").alias("tokens"))


_MH_PRIME = 2038074743  # 31-bit prime — same modulus Spark ML's MinHashLSH uses


def _mh_coeffs(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Fixed pseudo-random (a, b) pairs for the K universal-hash
    families — seeded, so signatures are deterministic across runs."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MH_PRIME), rng.randrange(0, _MH_PRIME))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    shingle_n: int = 3,
    keep: tuple[str, ...] = (),
    portable: bool = False,
) -> DataFrame:
    """doc_id (+ ``keep`` passthrough cols) + shingle set + K minhashes.

    Each shingle is string-hashed exactly ONCE (xxhash64, reduced mod a
    31-bit prime p); the K families are universal hashes
    ``(a_i*h + b_i) mod p`` with seeded 31-bit coefficients — products
    stay < 2^62 so the arithmetic is ANSI-safe in int64. K independent
    salted string hashes would cost K full passes over every shingle's
    bytes — this is the difference between 1 and K string hashes per
    shingle at 100 TB.

    The modulus is load-bearing: an earlier Kirsch-Mitzenmacher variant
    (``h1 + i*h2`` with NO wrap) kept argmin ≈ argmin(h2) for every
    salt i ≥ 2, collapsing the K families into near-copies — low-jaccard
    pairs then agreed on most bands (measured ~29 band hits per
    candidate at sf0.1, 700k candidates for 79 true pairs). With the
    wrap, per-family agreement probability is the pair's true jaccard,
    so banding recall/precision follow the standard S-curve.
    """
    coeffs = _mh_coeffs(num_hashes)
    # NULL text is the only way to an empty/NULL shingle array (sequence
    # always emits index 0, so non-null text yields ≥1 shingle). Filter
    # on the RAW column — a filter on size(shingles) would be pushed
    # below the projections by PushDownPredicates, duplicating the whole
    # shingle derivation inside the Filter (2× the map work; measured
    # ~2× on this stage). text IS NOT NULL reaches the parquet scan.
    sh = tokenized(docs.filter(F.col("text").isNotNull()), *keep).select(
        "doc_id", *keep, _shingles(F.col("tokens"), shingle_n).alias("shingles")
    )

    # portable=True swaps xxhash64 for the md5-derived hash (_md5h32) so
    # every downstream value — families, minima, band keys — is exact
    # integer arithmetic any md5-bearing engine reproduces; production
    # keeps xxhash64 (one cheap pass per shingle's bytes).
    if portable:
        hashed = F.transform(
            "shingles", lambda s: F.pmod(_md5h32(s), F.lit(_MH_PRIME))
        )
    else:
        hashed = F.transform(
            "shingles", lambda s: F.pmod(F.xxhash64(s), F.lit(_MH_PRIME))
        )
    hp = sh.select("doc_id", *keep, "shingles", hashed.alias("hp"))
    # One array_min per hash family, all referencing the SAME hp column
    # (16 references → CollapseProject keeps hp materialized instead of
    # inlining the string-hash transform into each family).
    def family(i: int) -> F.Column:
        a, b = coeffs[i]
        return F.array_min(
            F.transform("hp", lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MH_PRIME)))
        )

    minhashes = F.array(*[family(i) for i in range(num_hashes)])
    return hp.select("doc_id", *keep, "shingles", minhashes.alias("minhash"))


def _band_keys(
    sig: DataFrame, num_hashes: int, bands: int, portable: bool = False
) -> DataFrame:
    """(doc_id, band, band_sig) key rows — the LSH bucket membership
    every banding consumer shuffles on. Only this compact triple ever
    crosses the bucket shuffle; shingle arrays and passthrough columns
    never ship through the B× explode."""
    rows_per_band = num_hashes // bands

    def band_sig(b: F.Column) -> F.Column:
        joined = F.concat_ws(
            ",",
            F.transform(
                F.slice("minhash", b * rows_per_band + 1, rows_per_band),
                lambda x: x.cast("string"),
            ),
        )
        # portable: join on the raw value string (engine-neutral);
        # default: murmur-compact it so the shuffle key is 4 bytes
        return joined if portable else F.hash(joined)

    return sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(b.alias("band"), band_sig(b).alias("band_sig")),
            )
        ).alias("bs"),
    ).select("doc_id", "bs.band", "bs.band_sig")


def _band_candidates(
    sig: DataFrame, num_hashes: int, bands: int, portable: bool = False
) -> DataFrame:
    """LSH banding candidate generation shared by every MinHash consumer:
    explode the K-vector into B band signatures, self-join on the compact
    (band, band_sig) key, emit distinct ordered (doc_a, doc_b) pairs.

    Candidates ∝ Σ_bucket |bucket|², never O(n²)."""
    keys = _band_keys(sig, num_hashes, bands, portable=portable)
    return (
        keys.alias("a")
        .join(
            keys.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def near_dup_pairs(
    spark: SparkSession,
    sf_dir: str,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    portable: bool = False,
) -> DataFrame:
    """X2 — MinHash+LSH near-duplicate pairs with exact-Jaccard verify.

    Pipeline: shingle → minhash(K) → band(B) → explode bands →
    self-join on (band, band_signature) → dedupe candidate pairs →
    verify with exact Jaccard on shingle sets → threshold.
    """
    from lakeflow.plancache import tier

    docs = normalized_docs(spark, sf_dir)
    # The signature stage (shingle + K hashes per shingle) is the
    # expensive map work — materialize it once so the three consumers
    # below (band keys, and both sides of the verify join) don't each
    # recompute it. Same medallion rationale as the silver persist:
    # at 100 TB this stage would be written out as its own table.
    # Plan-memoized per (session, sf_dir, params): constructing the K
    # hash-family expression tree costs ~0.5 s of py4j traffic per call
    # (measured r11, lakeflow.plancache).
    sig = tier(
        spark,
        ("minhash_sig", sf_dir, num_hashes, portable),
        lambda: minhash_signatures(docs, num_hashes, portable=portable).persist(),
    )

    cand = _band_candidates(sig, num_hashes, bands, portable=portable)

    # Verify: fetch shingle sets for the (few) surviving candidates.
    sh = sig.select("doc_id", "shingles")
    pairs = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sh.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", F.col("sa.shingles").alias("sh_a"), F.col("sb.shingles").alias("sh_b"))
    )
    jacc = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        pairs.select("doc_a", "doc_b", F.round(jacc, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def near_dup_pairs_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: :func:`near_dup_pairs` on the md5 portable
    shingle hash — the whole MinHash→banding→verify pipeline becomes
    deterministic integer arithmetic DuckDB replays exactly
    (NEAR_DUP_SQL), so even the LSH *candidate generation* is
    oracle-checked, not just the verified survivors."""
    return near_dup_pairs(spark, sf_dir, portable=True)


def _near_dup_oracle_sql(
    num_hashes: int = 16, bands: int = 8, threshold: float = 0.5, shingle_n: int = 3
) -> str:
    """DuckDB twin of the portable near-dup pipeline, with the seeded
    universal-hash coefficients baked in as literals."""
    coeffs = _mh_coeffs(num_hashes)
    r = num_hashes // bands
    fams = ", ".join(
        f"list_min(list_transform(hp, h -> (h * {a} + {b}) % {_MH_PRIME}))"
        for a, b in coeffs
    )
    bsig = " || ',' || ".join(
        f"CAST(mh[band * {r} + {i + 1}] AS VARCHAR)" for i in range(r)
    )
    return f"""
WITH norm AS (
    SELECT doc_id,
           string_split_regex(
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g')),
               '\\s+') AS tokens
    FROM documents WHERE text IS NOT NULL
), sh AS (
    SELECT doc_id,
           list_distinct(
               list_transform(range(1, greatest(len(tokens) - {shingle_n}, 0) + 2),
                              i -> array_to_string(tokens[i:i+{shingle_n - 1}], ' '))) AS shingles
    FROM norm
), hp AS (
    SELECT doc_id, shingles,
           list_transform(shingles, s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) % {_MH_PRIME}) AS hp
    FROM sh
), sig AS (
    SELECT doc_id, shingles, [{fams}] AS mh FROM hp
), keys AS (
    SELECT doc_id, band, {bsig} AS bsig
    FROM sig, range(0, {bands}) t(band)
), cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM keys a JOIN keys b
      ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
             / len(list_distinct(list_concat(x.shingles, y.shingles))), 6) AS jaccard
FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b
WHERE round(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
            / len(list_distinct(list_concat(x.shingles, y.shingles))), 6) >= {threshold}
ORDER BY doc_a, doc_b
"""


NEAR_DUP_SQL = _near_dup_oracle_sql()


def dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication-flow matrix (r8): for every unordered
    source pair, the count of verified near-dup pairs whose endpoints
    live in those sources, plus their mean Jaccard — the
    corpus-planning diagnostic that decides which source pairs are
    worth CROSS-deduping at all. `q_source_overlap` answers "do these
    sources share vocabulary?"; this answers "do they share actual
    documents?" — the duplication-flow question (e.g. how much of a
    web crawl is already inside a curated subset of it) that decides
    dedup topology before anyone pays for it.

    Composition of the certified portable near-dup pipeline
    (:func:`near_dup_pairs_portable` — md5 MinHash banding + exact
    Jaccard verify, never all-pairs): the pair list joins the
    (doc_id, source) projection twice (pair-count-bounded shuffles; at
    100 TB the pair list is itself the small side and broadcastable),
    the pair key is normalized with least/greatest so the matrix is
    one unordered triangle, and the result is |sources|²-bounded.
    avg_jaccard goes through exact micro-unit integer sums
    (floor(j·1e6 + 0.5)) so the mean is order-free across engines —
    the same recipe as the ADC/KL sums.
    """
    pairs = near_dup_pairs(spark, sf_dir, portable=True)
    src = io.read_table(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("source", F.lit("(none)")).alias("source")
    )
    j6 = F.floor(F.col("jaccard") * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    tagged = (
        pairs.join(src.alias("ra"), F.col("doc_a") == F.col("ra.doc_id"))
        .join(src.alias("rb"), F.col("doc_b") == F.col("rb.doc_id"))
        .select(
            F.least("ra.source", "rb.source").alias("source_a"),
            F.greatest("ra.source", "rb.source").alias("source_b"),
            j6.alias("j6"),
        )
    )
    return (
        tagged.groupBy("source_a", "source_b")
        .agg(F.count("*").alias("dup_pairs"), F.sum("j6").alias("sj"))
        .select(
            "source_a",
            "source_b",
            "dup_pairs",
            F.round(
                F.col("sj").cast("double") / F.lit(1e6) / F.col("dup_pairs"), 6
            ).alias("avg_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


DUP_MATRIX_SQL = f"""
SELECT source_a, source_b,
       CAST(count(*) AS BIGINT) AS dup_pairs,
       round(CAST(sum(CAST(floor(jaccard * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000.0 / count(*), 6) AS avg_jaccard
FROM (
    SELECT least(coalesce(da.source, '(none)'), coalesce(db.source, '(none)')) AS source_a,
           greatest(coalesce(da.source, '(none)'), coalesce(db.source, '(none)')) AS source_b,
           p.jaccard
    FROM ({NEAR_DUP_SQL}) p
    JOIN documents da ON da.doc_id = p.doc_a
    JOIN documents db ON db.doc_id = p.doc_b
)
GROUP BY source_a, source_b
ORDER BY source_a, source_b
"""


def ngram_novelty(
    spark: SparkSession, sf_dir: str, shingle_n: int = 5
) -> DataFrame:
    """Per-source n-gram NOVELTY profile — the tail-content diagnostic
    between exact dedup and near-dup: for each document, the fraction
    of its distinct 5-gram shingles whose FIRST occurrence (min doc_id
    over the corpus) is this document. Boilerplate-heavy sources score
    low (their shingles were already seen), long-tail sources score
    ~1. This is the corpus-planning number behind "how much of source
    X is new text vs re-crawl?" — cheaper than pairwise dedup because
    it never forms pairs at all.

    Plan shape (100 TB): explode distinct shingles (map-side, the same
    staged-token-array tier MinHash uses), reduce each shingle to a
    60-BIT PORTABLE md5 FINGERPRINT before it ships (8-byte shuffle
    keys instead of ~40-byte 5-gram strings; measured at sf10 this cut
    the warm median 104 s -> 45 s — SCALE.md §21.5a. 60 bits keeps the
    '0x'+15-hex cast inside BIGINT in both engines; collisions at 1e8
    distinct shingles are ~3e-3 expected — the same fingerprint trade
    q_doc_fingerprint and the winnowing family make), then ONE
    groupBy(fingerprint) for min(doc_id) — inverted-index-sized state,
    the same shuffle class as the MinHash signature pass — a
    fingerprint-keyed join back (both sides hash-partitioned on the
    same key: co-located, no extra exchange) and two partial aggs
    (doc, then source). No pair formation, no quadratic term anywhere.
    Per-doc novelty goes through round-half-up integer micro-units
    ((novel*2e6 + total) DIV (2*total)) so the per-source mean is an
    order-free integer sum — the ADC/KL recipe.
    """
    docs = normalized_docs(spark, sf_dir).withColumn(
        "src", F.coalesce("source", F.lit("(none)"))
    )
    toks = tokenized(docs, "src")
    sh = toks.select(
        "doc_id", "src", _shingles(F.col("tokens"), shingle_n).alias("shingles")
    )
    fp = F.conv(F.substring(F.md5(F.col("s")), 1, 15), 16, 10).cast("bigint")
    ex = sh.select("doc_id", "src", F.explode("shingles").alias("s")).select(
        "doc_id", "src", fp.alias("fp")
    )
    first = ex.groupBy("fp").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        ex.join(first, "fp")
        .groupBy("doc_id", "src")
        .agg(
            F.count("*").alias("total"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("bigint")).alias(
                "novel"
            ),
        )
        .withColumn("n6", F.expr("(novel * 2000000 + total) DIV (2 * total)"))
    )
    return (
        per_doc.groupBy("src")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("total").alias("total_shingles"),
            F.sum("novel").alias("novel_shingles"),
            F.round(
                F.sum("n6").cast("double") / F.lit(1e6) / F.count("*"), 6
            ).alias("avg_novelty"),
            F.sum((F.col("novel") == F.col("total")).cast("bigint")).alias(
                "fully_novel_docs"
            ),
        )
        .orderBy("src")
    )


def _ngram_novelty_sql(shingle_n: int = 5) -> str:
    return rf"""
WITH norm AS (
    SELECT doc_id, coalesce(source, '(none)') AS src,
           string_split_regex(
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), '\s+', ' ', 'g')),
               '\s+') AS tokens
    FROM documents WHERE text IS NOT NULL
), sh AS (
    SELECT doc_id, src,
           list_distinct(
               list_transform(range(1, greatest(len(tokens) - {shingle_n}, 0) + 2),
                              i -> array_to_string(tokens[i:i+{shingle_n - 1}], ' '))) AS shingles
    FROM norm
), ex AS (
    SELECT doc_id, src,
           CAST('0x' || substr(md5(u.s), 1, 15) AS BIGINT) AS fp
    FROM sh, UNNEST(shingles) AS u(s)
), first AS (
    SELECT fp, min(doc_id) AS first_doc FROM ex GROUP BY 1
), per_doc AS (
    SELECT doc_id, src,
           count(*) AS total,
           sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS novel
    FROM ex JOIN first USING (fp)
    GROUP BY 1, 2
)
SELECT src,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(total) AS BIGINT) AS total_shingles,
       CAST(sum(novel) AS BIGINT) AS novel_shingles,
       round(CAST(sum((novel * 2000000 + total) // (2 * total)) AS DOUBLE)
             / 1000000.0 / count(*), 6) AS avg_novelty,
       CAST(sum(CASE WHEN novel = total THEN 1 ELSE 0 END) AS BIGINT) AS fully_novel_docs
FROM per_doc
GROUP BY src ORDER BY src
"""


NGRAM_NOVELTY_SQL = _ngram_novelty_sql()


# size-class ladder for bucket-occupancy histograms (CASE, not log2:
# float log at exact powers of two is a portability hazard)
_OCC_CLASSES: tuple[tuple[str, int], ...] = (
    ("1", 1),
    ("2", 2),
    ("3-4", 4),
    ("5-8", 8),
    ("9-16", 16),
    ("17-32", 32),
    ("33-64", 64),
)
_OCC_OVERFLOW = "65+"


def _occ_class_sql(col: str) -> str:
    whens = " ".join(
        f"WHEN {col} <= {hi} THEN '{label}'" for label, hi in _OCC_CLASSES
    )
    return f"CASE {whens} ELSE '{_OCC_OVERFLOW}' END"


# numeric class upper bound (overflow = INT32 max) so consumers get the
# histogram in occupancy order, not lexicographic label order ('1',
# '17-32', '2', ... — ADVICE r8); emitted as a column in both engines
_OCC_OVERFLOW_UB = 2147483647


def _occ_ub_sql(col: str) -> str:
    whens = " ".join(
        f"WHEN {col} <= {hi} THEN {hi}" for _label, hi in _OCC_CLASSES
    )
    return f"CAST(CASE {whens} ELSE {_OCC_OVERFLOW_UB} END AS INTEGER)"


def lsh_occupancy(
    spark: SparkSession,
    sf_dir: str,
    num_hashes: int = 16,
    bands: int = 8,
    portable: bool = True,
) -> DataFrame:
    """LSH band-bucket occupancy histogram — the SKEW diagnostic for
    every banding consumer (near-dup, clusters, dup-matrix, the
    curation audit). Bucket-join cost is Σ_bucket occ·(occ-1)/2, so a
    handful of giant buckets (template families, boilerplate) can
    carry essentially ALL the candidate mass — the measured failure
    mode behind the sf10 curation ENOSPC (SCALE.md §20.3: 891M
    candidates from dense buckets) and the reason `bucket_cap` exists.
    This query is the audit a pipeline runs BEFORE paying for the
    candidate join: per occupancy size class, how many buckets, how
    many key postings, and — the decision number — how many candidate
    pairs that class would generate.

    Plan shape: the banding key explode is the SAME compact
    (doc_id, band, band_sig) projection the candidate join shuffles on
    (`_band_keys`); one groupBy(band, band_sig) count (bucket-sized
    state), one 8-row class rollup. Cost ∝ corpus × bands — it never
    forms a single candidate pair, which is the point: the audit is
    strictly cheaper than the join it prices.
    """
    docs = normalized_docs(spark, sf_dir)
    sig = minhash_signatures(docs, num_hashes, portable=portable)
    keys = _band_keys(sig, num_hashes, bands, portable=portable)
    occ = keys.groupBy("band", "band_sig").agg(F.count("*").alias("occ"))
    return (
        occ.withColumn("size_class", F.expr(_occ_class_sql("occ")))
        .withColumn("class_ub", F.expr(_occ_ub_sql("occ")))
        .groupBy("size_class", "class_ub")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("occ").alias("total_keys"),
            F.sum(F.expr("(occ * (occ - 1)) DIV 2")).alias("candidate_pairs"),
            F.max("occ").alias("max_occ"),
        )
        .orderBy("class_ub")
    )


def _lsh_occupancy_sql(
    num_hashes: int = 16, bands: int = 8, shingle_n: int = 3
) -> str:
    """DuckDB twin: replays the portable signature + banding keys with
    the seeded coefficients baked in (same construction as
    :func:`_near_dup_oracle_sql`), then the occupancy rollup."""
    coeffs = _mh_coeffs(num_hashes)
    r = num_hashes // bands
    fams = ", ".join(
        f"list_min(list_transform(hp, h -> (h * {a} + {b}) % {_MH_PRIME}))"
        for a, b in coeffs
    )
    bsig = " || ',' || ".join(
        f"CAST(mh[band * {r} + {i + 1}] AS VARCHAR)" for i in range(r)
    )
    return rf"""
WITH norm AS (
    SELECT doc_id,
           string_split_regex(
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), '\s+', ' ', 'g')),
               '\s+') AS tokens
    FROM documents WHERE text IS NOT NULL
), sh AS (
    SELECT doc_id,
           list_distinct(
               list_transform(range(1, greatest(len(tokens) - {shingle_n}, 0) + 2),
                              i -> array_to_string(tokens[i:i+{shingle_n - 1}], ' '))) AS shingles
    FROM norm
), hp AS (
    SELECT doc_id,
           list_transform(shingles, s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) % {_MH_PRIME}) AS hp
    FROM sh
), sig AS (
    SELECT doc_id, [{fams}] AS mh FROM hp
), keys AS (
    SELECT doc_id, band, {bsig} AS bsig
    FROM sig, range(0, {bands}) t(band)
), occ AS (
    SELECT band, bsig, count(*) AS occ FROM keys GROUP BY 1, 2
)
SELECT {_occ_class_sql('occ')} AS size_class,
       {_occ_ub_sql('occ')} AS class_ub,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(occ) AS BIGINT) AS total_keys,
       CAST(sum((occ * (occ - 1)) // 2) AS BIGINT) AS candidate_pairs,
       CAST(max(occ) AS BIGINT) AS max_occ
FROM occ
GROUP BY 1, 2 ORDER BY 2
"""


LSH_OCCUPANCY_SQL = _lsh_occupancy_sql()


def incremental_near_dups(
    spark: SparkSession,
    sf_dir: str,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    batch_mod: int = 5,
    portable: bool = False,
) -> DataFrame:
    """Incremental (batch-vs-corpus) near-dup detection — the shape a
    daily ingest actually runs: the historical corpus is already
    deduped, so today's batch only needs checking AGAINST it (and the
    self-join over history is never re-paid). The reference's bronze
    tier is exactly this cadence — daily incremental appends
    (reference: jobs/bronze/ingest_csv_to_delta.py, @daily Airflow
    schedule in dags/) — and this is its dedup companion.

    Plan shape (the 100 TB story): band keys for BOTH sides come from
    one signature pass, then the candidate join is **new-keys ×
    old-keys** on the compact (band, band_sig) bucket key — cost ∝
    |batch| × bucket occupancy, never |corpus|² and never a restated
    history self-join. In production the old side IS a stored
    signature table partitioned by (band, band_sig) (write
    ``minhash_signatures`` out as a silver tier and append each
    batch); the probe then prunes to the batch's buckets. Output is
    the drop decision table: one row per batch doc with ≥1 historical
    match — its best (highest-jaccard, tie → lowest id) historical
    duplicate and the total match count. Struct-max aggregation, one
    partial-aggregable shuffle; no window over the pair stream.

    ``batch_mod``: the batch is ``doc_id % batch_mod == 0`` (~1/mod of
    the corpus) — deterministic and SF-proportional, standing in for
    the ingest-date partition predicate a production run would use.
    """
    docs = normalized_docs(spark, sf_dir)
    # Same persisted signature tier as near_dup_pairs — CacheManager
    # dedupes the identical plan, so a session running both queries
    # builds signatures once.
    sig = minhash_signatures(docs, num_hashes, portable=portable).persist()
    is_new = F.col("doc_id") % batch_mod == 0
    cand_all = _band_candidates(sig, num_hashes, bands, portable=portable)
    # _band_candidates orders doc_a < doc_b; the batch doc may be either
    # side — normalize to (batch doc, historical doc). Exactly one end
    # being in the batch is the incremental predicate.
    a_new = F.col("doc_a") % batch_mod == 0
    b_new = F.col("doc_b") % batch_mod == 0
    cand = (
        cand_all.filter(a_new != b_new)
        .select(
            F.when(a_new, F.col("doc_a")).otherwise(F.col("doc_b")).alias("doc_id"),
            F.when(a_new, F.col("doc_b")).otherwise(F.col("doc_a")).alias("dup_of"),
        )
    )
    sh = sig.select("doc_id", "shingles")
    jacc = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    verified = (
        cand.join(
            sh.select(F.col("doc_id").alias("_ia"), F.col("shingles").alias("sh_a")),
            F.col("doc_id") == F.col("_ia"),
        )
        .join(
            sh.select(F.col("doc_id").alias("_ib"), F.col("shingles").alias("sh_b")),
            F.col("dup_of") == F.col("_ib"),
        )
        .select("doc_id", "dup_of", F.round(jacc, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    best = F.max(
        F.struct(F.col("jaccard"), (-F.col("dup_of")).alias("neg_id"))
    ).alias("b")
    return (
        verified.groupBy("doc_id")
        .agg(best, F.count("*").alias("n_matches"))
        .select(
            "doc_id",
            (-F.col("b.neg_id")).cast("bigint").alias("dup_of"),
            F.col("b.jaccard").alias("jaccard"),
            "n_matches",
        )
        .orderBy("doc_id")
    )


def _incremental_oracle_sql(
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    batch_mod: int = 5,
    shingle_n: int = 3,
) -> str:
    """DuckDB twin of the portable incremental pipeline: same signature
    CTEs as NEAR_DUP_SQL, candidate join restricted to exactly-one-end-
    in-batch, best-match pick via a deterministic window (jaccard DESC,
    dup_of ASC — the same total order the struct-max aggregation
    realizes on the Spark side)."""
    coeffs = _mh_coeffs(num_hashes)
    r = num_hashes // bands
    fams = ", ".join(
        f"list_min(list_transform(hp, h -> (h * {a} + {b}) % {_MH_PRIME}))"
        for a, b in coeffs
    )
    bsig = " || ',' || ".join(
        f"CAST(mh[band * {r} + {i + 1}] AS VARCHAR)" for i in range(r)
    )
    return f"""
WITH norm AS (
    SELECT doc_id,
           string_split_regex(
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g')),
               '\\s+') AS tokens
    FROM documents WHERE text IS NOT NULL
), sh AS (
    SELECT doc_id,
           list_distinct(
               list_transform(range(1, greatest(len(tokens) - {shingle_n}, 0) + 2),
                              i -> array_to_string(tokens[i:i+{shingle_n - 1}], ' '))) AS shingles
    FROM norm
), hp AS (
    SELECT doc_id, shingles,
           list_transform(shingles, s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) % {_MH_PRIME}) AS hp
    FROM sh
), sig AS (
    SELECT doc_id, shingles, [{fams}] AS mh FROM hp
), keys AS (
    SELECT doc_id, band, {bsig} AS bsig
    FROM sig, range(0, {bands}) t(band)
), cand AS (
    SELECT a.doc_id AS doc_id, b.doc_id AS dup_of
    FROM keys a JOIN keys b
      ON a.band = b.band AND a.bsig = b.bsig
     AND a.doc_id % {batch_mod} = 0 AND b.doc_id % {batch_mod} != 0
    GROUP BY 1, 2
), verified AS (
    SELECT cand.doc_id AS doc_id, cand.dup_of AS dup_of,
           round(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
                 / len(list_distinct(list_concat(x.shingles, y.shingles))), 6) AS jaccard
    FROM cand JOIN sh x ON x.doc_id = cand.doc_id JOIN sh y ON y.doc_id = cand.dup_of
    WHERE round(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
                / len(list_distinct(list_concat(x.shingles, y.shingles))), 6) >= {threshold}
)
SELECT doc_id, dup_of, jaccard,
       CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_matches
FROM verified
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY jaccard DESC, dup_of ASC) = 1
ORDER BY doc_id
"""


INCREMENTAL_NEAR_DUP_SQL = _incremental_oracle_sql()


def containment_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.6,
    num_hashes: int = 16,
    bands: int = 8,
    portable: bool = False,
) -> DataFrame:
    """Asymmetric shingle-CONTAINMENT near-duplicate pairs:
    |A∩B| / min(|A|, |B|) ≥ threshold — the boilerplate/quotation
    detector. Jaccard misses "small doc embedded in big doc" (the union
    dilutes the score); containment is the metric a curation pipeline
    uses to catch licenses, navigation chrome, and copied passages.

    Same block-then-verify plan as :func:`near_dup_pairs` (shared
    signature + banding stages); only the verify expression differs.
    Caveat, stated not hidden: MinHash banding's hit probability tracks
    JACCARD, so a high-containment/low-jaccard pair (tiny A inside huge
    B) can evade the blocker — at scale the asymmetric-recall path is
    chunk-level fingerprinting (ext/text.py winnowing: shared windows
    surface regardless of length ratio), with this operator as the
    verifier on fingerprint-collision candidates. The registered
    portable variant replays the ENTIRE pipeline (banding included) in
    DuckDB, so the oracle checks exactly what the plan computes.
    """
    docs = normalized_docs(spark, sf_dir)
    sig = minhash_signatures(docs, num_hashes, portable=portable).persist()
    cand = _band_candidates(sig, num_hashes, bands, portable=portable)
    sh = sig.select("doc_id", "shingles")
    pairs = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sh.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.col("sa.shingles").alias("sh_a"),
            F.col("sb.shingles").alias("sh_b"),
        )
    )
    contain = F.size(F.array_intersect("sh_a", "sh_b")) / F.least(
        F.size("sh_a"), F.size("sh_b")
    )
    return (
        pairs.select("doc_a", "doc_b", F.round(contain, 6).alias("containment"))
        .filter(F.col("containment") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def containment_pairs_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: md5 portable hash → the banding candidate
    generation AND the containment verify replay exactly in DuckDB."""
    return containment_pairs(spark, sf_dir, portable=True)


def _containment_oracle_sql(
    num_hashes: int = 16, bands: int = 8, threshold: float = 0.6, shingle_n: int = 3
) -> str:
    """DuckDB twin of the portable containment pipeline — the near-dup
    oracle with the verify metric swapped to |A∩B|/min(|A|,|B|)."""
    coeffs = _mh_coeffs(num_hashes)
    r = num_hashes // bands
    fams = ", ".join(
        f"list_min(list_transform(hp, h -> (h * {a} + {b}) % {_MH_PRIME}))"
        for a, b in coeffs
    )
    bsig = " || ',' || ".join(
        f"CAST(mh[band * {r} + {i + 1}] AS VARCHAR)" for i in range(r)
    )
    return f"""
WITH norm AS (
    SELECT doc_id,
           string_split_regex(
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g')),
               '\\s+') AS tokens
    FROM documents WHERE text IS NOT NULL
), sh AS (
    SELECT doc_id,
           list_distinct(
               list_transform(range(1, greatest(len(tokens) - {shingle_n}, 0) + 2),
                              i -> array_to_string(tokens[i:i+{shingle_n - 1}], ' '))) AS shingles
    FROM norm
), hp AS (
    SELECT doc_id, shingles,
           list_transform(shingles, s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) % {_MH_PRIME}) AS hp
    FROM sh
), sig AS (
    SELECT doc_id, shingles, [{fams}] AS mh FROM hp
), keys AS (
    SELECT doc_id, band, {bsig} AS bsig
    FROM sig, range(0, {bands}) t(band)
), cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM keys a JOIN keys b
      ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
             / least(len(x.shingles), len(y.shingles)), 6) AS containment
FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b
WHERE round(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
            / least(len(x.shingles), len(y.shingles)), 6) >= {threshold}
ORDER BY doc_a, doc_b
"""


CONTAINMENT_PAIRS_SQL = _containment_oracle_sql()


def cluster_split(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.4,
    train_256: int = 204,
    val_256: int = 230,
    edge_source: str = "lsh",
    bucket_cap: int | None = None,
    bits: int | None = None,
    bands: int | None = None,
) -> DataFrame:
    """Leakage-safe train/val/test split: the WHOLE near-duplicate
    cluster is assigned to one split by the content hash of its
    canonical id, so near-duplicate documents can never straddle the
    train/eval boundary — the contamination mode a plain per-row split
    (q_train_test_split) cannot prevent, and the reason production
    pipelines split AFTER dedup clustering, not before.

    Composition of two certified operators: :func:`dedup_clusters`
    (LSH edge generation + connected components) feeds a pure
    md5-bucket map stage (sampling.py's portable ``_bucket``
    expression) keyed on cluster_id. Zero additional shuffles beyond
    clustering; the split is reproducible across engines, runs, and
    repartitioning, and late-arriving members of a known cluster land
    in the same split forever.
    """
    from lakeflow.ext.sampling import _bucket

    cl = dedup_clusters(
        spark,
        sf_dir,
        threshold,
        edge_source=edge_source,
        bucket_cap=bucket_cap,
        bits=bits,
        bands=bands,
    )
    b = _bucket(F.col("cluster_id"))
    split = (
        F.when(b < train_256, "train").when(b < val_256, "val").otherwise("test")
    )
    return (
        cl.select("vec_id", "cluster_id", "cluster_size", split.alias("split"))
        .orderBy("vec_id")
    )


CLUSTER_SPLIT_SQL = """
WITH RECURSIVE v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
), n AS (
    SELECT vec_id, v,
           sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nv
    FROM v
), pairs AS (
    SELECT a.vec_id AS va, b.vec_id AS vb
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE round(list_aggregate(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]), 'sum')
                / (a.nv * b.nv), 6) >= 0.4
), edges AS (
    SELECT va AS src, vb AS dst FROM pairs
    UNION ALL
    SELECT vb, va FROM pairs
), reach(id, root) AS (
    SELECT vec_id, vec_id FROM v
    UNION
    SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
), comp AS (
    SELECT id AS vec_id, min(root) AS cluster_id FROM reach GROUP BY id
), sized AS (
    SELECT vec_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM comp
), bucketed AS (
    SELECT vec_id, cluster_id, cluster_size,
           (strpos('0123456789abcdef', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(CAST(cluster_id AS VARCHAR)), 2, 1)) - 1) AS bucket
    FROM sized
)
SELECT vec_id, cluster_id, cluster_size,
       CASE WHEN bucket < 204 THEN 'train'
            WHEN bucket < 230 THEN 'val'
            ELSE 'test' END AS split
FROM bucketed
ORDER BY vec_id
"""


def _bands_for_threshold(
    threshold: float, num_hashes: int, recall_floor: float = 0.95
) -> int:
    """Fewest bands (longest rows-per-band) whose banding S-curve still
    catches a pair at exactly ``threshold`` with ≥ ``recall_floor``
    probability: recall(t) = 1 − (1 − t^r)^B. Longer rows push the
    S-curve midpoint up toward the threshold, which is what prunes
    candidates — at sf1 (50k docs) t=0.3 needs r=2/B=32 and admits 38M
    candidates (the corpus's noise floor sits just under 0.3), while
    t=0.8 tunes to r=4/B=16 and at r=8 admits just 1.2k. The threshold
    regime, not the plan shape, decides the candidate economy."""
    best = num_hashes  # r=1 always satisfies the floor
    for r in (2, 4, 8, 16, 32):
        if num_hashes % r:
            continue
        b = num_hashes // r
        if 1 - (1 - threshold**r) ** b >= recall_floor:
            best = b
    return best


def ngram_jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.3,
    block_on: str = "minhash",
    num_hashes: int = 64,
    bands: int | None = None,
) -> DataFrame:
    """Same-language n-gram (bigram) Jaccard similarity join,
    block-then-verify.

    ``block_on="minhash"`` (default, the registered/100 TB path): MinHash
    band signatures generate the candidate pairs (:func:`_band_candidates`
    over bigram-shingle signatures), then the exact bigram Jaccard —
    identical expression to the coarse twin — verifies each candidate and
    applies the same-language + threshold predicates. Bucketed join on
    compact (band, band_sig) keys: candidates ∝ Σ_bucket |bucket|², never
    the O(n²)-per-language self-join the old ``lang`` blocking degraded
    to (VERDICT r3 finding #1 — `lang` has ~3 values, so "blocking"
    barely pruned and each block was quadratic).

    Blocking recall is engineered, not hoped for: ``bands=None`` picks
    the fewest bands whose S-curve still catches a threshold-grade pair
    with ≥95% probability (:func:`_bands_for_threshold`) — t=0.3 →
    r=2/B=32 (hit prob 0.951 at j=0.3, ≈1−1e-14 at j≥0.8); with the
    fixed seeds the outcome is deterministic per dataset, and the
    sf0.001/sf0.01 parity tests (tests/test_ext.py) pin band-blocked ≡
    exact lang-blocked so the driver's DuckDB oracle (exhaustive
    same-lang twin, NGRAM_JACCARD_SQL) stays the correctness gate.
    False candidates cost only verify IO — the exact Jaccard discards
    them.

    Candidate economics, measured at sf1 (50k docs): LSH candidates ∝
    pairs above the banding midpoint, a property of the DATA and the
    THRESHOLD, not the plan. This corpus's mutual-similarity noise
    floor (~0.25 bigram Jaccard — tiny synthetic vocabulary) sits just
    under the registered t=0.3, so r=2 banding admits 38M candidates
    and the verify pass costs ~15 s; the same code at the production
    near-dup regime (t=0.8, auto-tuned r=4; r=8 in the probe) admits
    ~1.2k candidates and runs in ~5 s, sig-build-bound — i.e. ~linear.
    A 100 TB deployment dedups at 0.7-0.85 where this plan is linear;
    t=0.3 on a dense-similarity corpus is inherently near-quadratic in
    the verify stage for ANY blocking scheme, because those pairs
    genuinely exist (histogram at sf1: 2.2k of 2.3k output pairs sit
    at j ≥ 0.6).

    ``block_on=<column>`` (e.g. ``"lang"``): the legacy coarse-key twin,
    exhaustive within blocks — kept as the small-SF oracle path.
    """
    if bands is None:
        bands = _bands_for_threshold(threshold, num_hashes)
    docs = normalized_docs(spark, sf_dir)
    jacc = F.size(F.array_intersect("a.sh", "b.sh")) / F.size(
        F.array_union("a.sh", "b.sh")
    )
    if block_on != "minhash":
        t = tokenized(docs, block_on).select(
            "doc_id", F.col(block_on).alias("blk"), _shingles(F.col("tokens"), 2).alias("sh")
        )
        a, b = t.alias("a"), t.alias("b")
        return (
            a.join(
                b,
                (F.col("a.blk") == F.col("b.blk"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.round(jacc, 6).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
            .orderBy("doc_a", "doc_b")
        )
    # Band-blocked path. Signatures are built on the SAME bigram shingles
    # the verify stage uses (shingle_n=2), staged once for both the band
    # keys and the two verify-side fetches.
    #
    # Verify-cost engineering (the candidate set is noise-dominated —
    # the synthetic corpus is mutually similar just under threshold, so
    # ~40× more candidates than true pairs survive banding at ANY
    # (r, B); the verify stage, not blocking, is the hot loop):
    # - Jaccard is computed on xxhash64(shingle) int64 arrays, not the
    #   string arrays: set sizes are preserved up to a 64-bit collision
    #   (P ≈ |union|²/2⁶⁴ ≈ 5e-16 per pair — no measurable effect on
    #   the exact-oracle gate; parity with the string-exact twin is
    #   pinned at two SFs in tests/test_ext.py).
    # - A size-ratio prune rides the candidate join: j(A,B) ≤ |A|/|B|
    #   for |A| ≤ |B|, so pairs whose shingle-set sizes differ by more
    #   than the threshold ratio are discarded BEFORE the array fetch,
    #   from 8-byte counts already in the key frame.
    # sig is persisted because candidate generation references it on
    # BOTH sides of the band self-join. The verify side is NOT taken
    # from sig: an unmaterialized cache reports unknown (max) size and
    # would force the verify joins to plan as sort-merge until AQE
    # re-plans — measured +1.5 s of stage barriers at sf0.1. Built from
    # the scan directly, the verify side carries real (small) stats, so
    # Catalyst statically broadcasts it at test SF and falls back to a
    # shuffled equi-join on doc_id — bounded by the candidate count —
    # when stats say corpus.
    sig = minhash_signatures(docs, num_hashes, shingle_n=2).persist()
    side = tokenized(docs.filter(F.col("text").isNotNull()), "lang").select(
        "doc_id",
        "lang",
        F.transform(_shingles(F.col("tokens"), 2), lambda s: F.xxhash64(s)).alias("sh"),
    )
    side = side.withColumn("n_sh", F.size("sh"))
    cand = _band_candidates(sig, num_hashes, bands)
    pairs = (
        cand.join(side.alias("a"), F.col("doc_a") == F.col("a.doc_id"))
        .join(
            side.alias("b"),
            (F.col("doc_b") == F.col("b.doc_id"))
            # lang equality and the size-ratio prune ride the verify
            # join as extra predicates (no separate join stages); the
            # OUTPUT contract stays "same-language pairs", matching the
            # oracle. At test SF these joins auto-broadcast the small
            # side frame; at 100 TB they become shuffled equi-joins on
            # doc_id bounded by the candidate count — no hint either way.
            & (F.col("a.lang") == F.col("b.lang"))
            & (
                F.least("a.n_sh", "b.n_sh")
                >= F.greatest("a.n_sh", "b.n_sh") * F.lit(threshold)
            ),
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("a.sh", "b.sh")).alias("inter"),
            (F.col("a.n_sh") + F.col("b.n_sh")).alias("n_sum"),
        )
        # |A∪B| = |A| + |B| − |A∩B| (shingle arrays are distinct), so
        # the union hash-set pass — as expensive as the intersect — is
        # replaced by integer arithmetic.
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("inter") / (F.col("n_sum") - F.col("inter")), 6).alias(
                "jaccard"
            ),
        )
    )
    return (
        pairs.filter(F.col("jaccard") >= threshold).orderBy("doc_a", "doc_b")
    )


NGRAM_JACCARD_SQL = """
WITH norm AS (
    SELECT doc_id, lang,
           string_split_regex(
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g')),
               '\\s+') AS tokens
    FROM documents
), sh AS (
    SELECT doc_id, lang,
           list_distinct(
               list_transform(range(1, greatest(len(tokens) - 2, 0) + 2),
                              i -> array_to_string(tokens[i:i+1], ' '))) AS sh
    FROM norm
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.3
ORDER BY doc_a, doc_b
"""


def _md5h32(col: F.Column | str) -> F.Column:
    """Portable 32-bit token hash: first 8 hex digits of md5, as bigint.

    Bit-for-bit reproducible in any engine with md5 (DuckDB:
    ``CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)``) — the
    cross-engine-verifiable alternative to engine-native murmur3/xxhash.
    ~10× the cost of F.hash, so it's the ORACLE hash, not the 100 TB
    default.
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def simhash(
    spark: SparkSession, sf_dir: str, bits: int = 32, portable: bool = False
) -> DataFrame:
    """SimHash document signatures: sign-aggregate token hashes per bit.

    Pure expression pipeline: explode tokens → hash → per-bit ±1
    vote via bitwise ops → aggregate votes → reassemble bit vector.
    ``portable=True`` swaps murmur3 for the md5-derived 32-bit hash
    (:func:`_md5h32`) so the signature is engine-independent and the
    query can carry a DuckDB oracle; production keeps the cheap
    engine-native hash (signatures only ever compare within one run).
    """
    docs = normalized_docs(spark, sf_dir)
    tok = tokenized(docs).select(
        "doc_id", F.explode(F.array_distinct("tokens")).alias("tok")
    )
    h = _md5h32("tok") if portable else F.hash("tok").cast("bigint")
    tok = tok.withColumn("h", h)
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"bit{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    sim = None
    for i in range(bits):
        term = F.when(F.col(f"bit{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.cast("bigint").alias("simhash")).orderBy("doc_id")


def simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: :func:`simhash` on the md5 portable hash, which
    lets DuckDB reproduce the exact 32-bit signature (SIMHASH_SQL)."""
    return simhash(spark, sf_dir, portable=True)


SIMHASH_SQL = """
WITH norm AS (
    SELECT doc_id,
           string_split_regex(
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g')),
               '\\s+') AS tokens
    FROM documents WHERE text IS NOT NULL
), tok AS (
    SELECT doc_id, unnest(list_distinct(tokens)) AS tok FROM norm
), h AS (
    SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS h FROM tok
), votes AS (
    SELECT doc_id, i,
           sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
    FROM h, range(0, 32) t(i)
    GROUP BY doc_id, i
)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN 1::BIGINT << i ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id ORDER BY doc_id
"""


def embedding_near_dups(
    spark: SparkSession, sf_dir: str, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs over the embeddings table —
    the semantic-dedup complement to the lexical MinHash path.

    Exact at test scale: all-pairs via a self-join on vec_id ordering
    (O(n²) pairs but map-side only — the smaller side broadcasts, no
    shuffle of the corpus). The 100 TB path swaps the broadcast for the
    sign-LSH bucket join in lakeflow.ext.similarity.knn_lsh / the IVF
    lists in knn_ivf — block-then-verify, identical verify expression.
    """
    from pyspark.sql.functions import broadcast

    from lakeflow.ext.similarity import _cosine, _dot, _dvec, _norm

    emb = (
        io.read_table(spark, sf_dir, "embeddings")
        .select("vec_id", _dvec("embedding").alias("v"))
        .select("vec_id", "v", _norm("v").alias("nv"))
    )
    a, b = emb.alias("a"), broadcast(emb.alias("b"))
    cos = _cosine(_dot("a.v", "b.v"), F.col("a.nv"), F.col("b.nv"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("vec_a", "vec_b")
        # The pair list is tiny (thresholded output, ≪ corpus) but its
        # derivation is the expensive cosine self-join. Persisting lets
        # CacheManager (which dedupes by canonicalized plan) share ONE
        # materialization between the pair query and the clustering
        # query that builds its edge list from the identical subtree.
        .persist()
    )


def _lsh_params(
    threshold: float,
    target_recall: float = 0.98,
    max_bands: int = 48,
    n: int | None = None,
    target_bucket: int = 128,
    forced_max_bands: int = 64,
) -> tuple[int, int]:
    """Auto-tune (bits_per_band, bands) for random-hyperplane LSH.

    For cosine ``threshold`` t the per-hyperplane sign-agreement
    probability is p = 1 - arccos(t)/pi; a pair at t survives banding
    with prob 1-(1-p^bits)^bands. Pick the LARGEST bits (strongest
    pruning of sub-threshold pairs) whose band count for
    ``target_recall`` fits ``max_bands``. High thresholds (the
    semantic-dedup production regime, t >= 0.8) land on deep buckets
    with near-zero false-candidate rates; low thresholds degrade to
    few bits — the curse of dimensionality, no blocking scheme prunes
    cosine-0.4 pairs well — but recall stays engineered, never
    accidental.

    ``n`` (corpus size, when known) adds the SCALE floor the recall
    tuner alone misses: candidates grow ∝ bands·n²/2^bits, so once
    expected bucket occupancy n/2^bits outgrows ``target_bucket`` the
    candidate join goes quadratic no matter how good the recall math
    looks (measured at sf1: 20k vectors, t=0.4 → bits=5 = 32 buckets
    → ~475M raw candidates, 141 s; with the floor, bits=8/bands=64 →
    ~50M, and recall at exactly t degrades 0.98 → ~0.80 while pairs
    at 0.6+ stay ≥0.98 — for CLUSTERING, transitive paths recover
    most boundary pairs). The floor only engages when n > target_bucket
    · 2^tuned_bits, so certification-scale runs (n ≤ 4096 here) are
    byte-identical with or without ``n``. At the production regime
    (t ≥ 0.8) the tuner already picks deep buckets and the floor is a
    no-op at any n. bands is capped at ``forced_max_bands`` in floor
    mode: past that, band-key volume (bands·n rows) replaces the
    candidate join as the dominant cost — the honest statement is that
    sub-0.5 cosine thresholds do not block well in high dimensions;
    dedup there should move to the IVF path or raise the threshold."""
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    best = (1, max_bands)
    for bits in range(1, 33):
        band_hit = p**bits
        if band_hit >= 1.0:
            continue
        bands = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - band_hit))
        if bands <= max_bands:
            best = (bits, bands)
        else:
            break
    if n is not None and n > 0:
        min_bits = max(1, math.ceil(math.log2(max(1.0, n / target_bucket))))
        if min_bits > best[0]:
            bits = min(min_bits, 24)
            band_hit = p**bits
            bands = math.ceil(
                math.log(1.0 - target_recall) / math.log(1.0 - band_hit)
            )
            best = (bits, min(bands, forced_max_bands))
    return best


def _portable_hyperplanes(dims: int, n_planes: int, seed: int):
    """Deterministic Gaussian hyperplanes every ENGINE can regenerate:
    md5(seed:p:d:a/b) → two 32-bit uniforms → Box-Muller. Replaces the
    numpy RNG (whose bit stream no SQL engine can replay) so the
    banded sign-LSH becomes exactly oracle-checkable — u = (int32 +
    0.5) / 2^32 and sqrt(-2 ln u1)·cos(2π u2) are bit-identical
    float64 in numpy and DuckDB (verified; ulp differences in libm
    could only flip a sign when |v·h| < ~1e-14, measure-zero here).
    Cached per (dims, n_planes, seed) — ~12k md5 calls once per
    process, nothing shipped to executors."""
    import hashlib
    import math

    import numpy as np

    key = (dims, n_planes, seed)
    H = _HYPERPLANE_CACHE.get(key)
    if H is None:
        H = np.empty((dims, n_planes))
        for p in range(n_planes):
            for d in range(dims):
                ha = hashlib.md5(f"{seed}:{p}:{d}:a".encode()).hexdigest()
                hb = hashlib.md5(f"{seed}:{p}:{d}:b".encode()).hexdigest()
                u1 = (int(ha[:8], 16) + 0.5) / 4294967296.0
                u2 = (int(hb[:8], 16) + 0.5) / 4294967296.0
                H[d, p] = math.sqrt(-2.0 * math.log(u1)) * math.cos(
                    2.0 * math.pi * u2
                )
        _HYPERPLANE_CACHE[key] = H
    return H


_HYPERPLANE_CACHE: dict = {}


def embedding_near_dups_lsh(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.95,
    bands: int | None = None,
    bits: int | None = None,
    seed: int = 7,
    bucket_cap: int | None = None,
    verify_broadcast: bool | None = None,
) -> DataFrame:
    """Scale-safe embedding near-dup pairs: banded random-hyperplane
    LSH block-then-verify — the 100 TB default edge generator (the
    all-pairs twin :func:`embedding_near_dups` survives only as the
    small-SF oracle path; VERDICT r2 finding #1).

    Same shape as the MinHash path (:func:`near_dup_pairs`):

    1. **Bucket**: one Arrow-batched ``mapInPandas`` computes every
       band bucket in a single numpy matmul against ``bands*bits``
       deterministic (seeded) Gaussian hyperplanes — sign bits packed
       per band into a long. Per-row output is (vec_id, bands longs):
       the embedding itself never leaves the stage.
    2. **Block**: posexplode to (vec_id, band, bucket) and self-join on
       the compact (band, bucket) key — a plain shuffled equi-join,
       candidates ∝ Σ_bucket |bucket|², never O(n²) and never a
       corpus-sized broadcast (plan-asserted in tests/test_plans.py).
    3. **Verify**: distinct candidate id-pairs re-join the vectors
       (two shuffles keyed on vec_id, bounded by the candidate count)
       and the EXACT cosine — same expression as the all-pairs twin —
       applies the threshold, so false candidates cost IO, never
       correctness; misses are bounded by the tuned recall (>=0.98 at
       the threshold, higher above it; recall-floor test vs exact at
       sf0.01).

    ``bucket_cap`` (opt-in, default off): drop (band, bucket) groups
    whose occupancy exceeds the cap before the candidate self-join.
    When the corpus has LARGE similarity clusters, buckets mirror
    them and Σ|b|² goes data-quadratic regardless of bit depth — a
    giant bucket is an uninformative band for blocking, and the docs
    inside it are better handled by within-cluster passes. Measured
    at sf10 (200k vectors, t=0.4): uncapped candidates 891M. The cap
    is a recall trade ONLY for pairs whose every co-occurring bucket
    is over-cap; certification paths never set it, so oracle replay
    is unaffected.

    ``verify_broadcast`` (None = auto by parquet footer size): the
    verify stage re-joins candidate id-pairs with the vector table
    twice. Hashing the SMALL vector table to every task keeps the
    (candidate-count-sized) pair stream narrow — without it, the
    second join sort-merges pairs already carrying a vector column
    (measured at sf10: 625M pairs × ~160 B spilled >78 GB of sort
    files and killed the job; with the broadcast the pair stream
    never widens and the same query completes). Auto engages when
    the on-disk table is < 64 MB (~≤ 256 MB in memory) — the same
    size-keyed decision AQE would make with accurate stats; at
    10⁹-vector scale it stays off and candidate pruning
    (``bucket_cap``, deeper buckets) is the operative lever.
    """
    import numpy as np
    import pandas as pd

    from lakeflow.ext.similarity import _cosine, _dot, _dvec, _norm

    emb = (
        io.read_table(spark, sf_dir, "embeddings")
        .select("vec_id", _dvec("embedding").alias("v"))
        .select("vec_id", "v", _norm("v").alias("nv"))
    )
    if bits is None or bands is None:
        # corpus-size-aware tuning from parquet FOOTER metadata — no
        # scan, no Spark job at plan-construction time (an eager
        # count() here made every curated_docs/cluster_split build pay
        # a full embeddings scan). At certification scales the result
        # is identical to the n-free tuning, so oracle rows are
        # unaffected.
        bits, bands = _lsh_params(threshold, n=io.parquet_row_count(sf_dir, "embeddings"))
    n_planes = bands * bits

    def bucketize(batches):
        H = None
        weights = (1 << np.arange(bits)).astype(np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["v"].to_numpy())
            if H is None:
                # deterministic PORTABLE hyperplanes — every task (and
                # the DuckDB oracle) regenerates the same matrix from
                # the seed; nothing is shipped
                H = _portable_hyperplanes(V.shape[1], n_planes, seed)
            signs = (V @ H) >= 0.0
            buckets = signs.reshape(len(pdf), bands, bits) @ weights
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "buckets": list(buckets)}
            )

    keys = (
        emb.select("vec_id", "v")
        .mapInPandas(bucketize, "vec_id bigint, buckets array<bigint>")
        .select("vec_id", F.posexplode("buckets").alias("band", "bucket"))
    )
    if bucket_cap is not None:
        # occupancy filter: one aggregate on the SAME (band, bucket)
        # key the candidate join shuffles on, so the exchange is shared
        ok = (
            keys.groupBy("band", "bucket")
            .agg(F.count("*").alias("_bsz"))
            .filter(F.col("_bsz") <= bucket_cap)
            .drop("_bsz")
        )
        keys = keys.join(ok, ["band", "bucket"]).select("vec_id", "band", "bucket")
    cand = (
        keys.alias("a")
        .join(
            keys.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    va = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("v_a"), F.col("nv").alias("n_a")
    )
    vb = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("v_b"), F.col("nv").alias("n_b")
    )
    if verify_broadcast is None:
        verify_broadcast = io.parquet_byte_size(sf_dir, "embeddings") < (64 << 20)
    if verify_broadcast:
        va, vb = F.broadcast(va), F.broadcast(vb)
    # Verify cosine stays the JVM aggregate fold — measured FASTEST of
    # three verify kernels on the sf1 stress corpus (48.8M candidate
    # pairs × 64 dims): HOF fold 65 s, Arrow/numpy einsum 103 s (the
    # kernel win is swamped by shipping 10 GB of candidate vectors
    # through serialization), unrolled 64-term codegen expression
    # 256 s (ANSI element_at branching + deep-arithmetic codegen).
    # The candidate COUNT, not the kernel, is the lever: it is a data
    # property (pairs above the corpus's similarity noise floor — the
    # sf1 per-label Gaussians put ~24% of all pairs within one banding
    # miss of t=0.4), which the _lsh_params size floor already bounds
    # (475M → 49M here); at the production dedup regime (t ≥ 0.8) the
    # tuner's deep buckets prune to ~true pairs and verify is trivial.
    cos = _cosine(_dot("v_a", "v_b"), F.col("n_a"), F.col("n_b"))
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .orderBy("vec_a", "vec_b")
        # Persist the (tiny, thresholded) pair output so CacheManager
        # shares ONE materialization of the bucketize→block→verify
        # pipeline across its consumers — q_dedup_embedding, the
        # clusters edge list, and both graph queries all derive from
        # this frame (cloudpickle canonicalizes the mapInPandas stage
        # deterministically, so cross-invocation plan identity holds —
        # measured 9.1 s → 0.22 s on the second invocation at sf0.1).
        # Same rationale and bound as the exact twin's persist: one
        # cache entry per (sf_dir, threshold).
        .persist()
    )


def embedding_near_dups_ivf(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.4,
    n_lists: int | None = None,
    nprobe: int = 4,
    lloyd_iters: int = 2,
) -> DataFrame:
    """IVF-blocked embedding near-dup pairs: k-means cells as the
    blocker instead of sign-LSH bands, with ``nprobe`` multi-cell
    assignment for boundary recall. n_lists ≈ √n grows with the
    corpus; each Lloyd round is two bounded shuffles with only the
    centroid relation crossing stages.

    MEASURED VERDICT (SCALE.md §12, late r4): at the low-threshold
    regime this was built to test (t=0.4), IVF blocking does NOT beat
    banding — recall/cost tracks the same frontier (sf0.1: nprobe=4
    → recall 0.82, nprobe=8 → 0.995 but ~as many candidates as the
    banded path at its 0.80; sf1 wall time equal or worse, and
    the nearest-cell ranking itself costs an n×n_lists distance
    pass). Both schemes are bound by the same data property — the
    count of pairs near the threshold — so the operator is kept as
    the measured ALTERNATIVE (and for centroid-count regimes where
    cells are genuinely discriminative, t ≥ 0.8 with tight clusters),
    not as a default anywhere. Recall is empirical (no closed-form
    S-curve): characterization tests pin it vs the exact twin at two
    SFs.
    """
    from lakeflow.ext.similarity import (
        _cosine,
        _dot,
        _dvec,
        _nearest_lists,
        _norm,
        kmeans_centroids,
    )

    emb = (
        io.read_table(spark, sf_dir, "embeddings")
        .select("vec_id", _dvec("embedding").alias("v"))
        .select("vec_id", "v", _norm("v").alias("nv"))
    )
    if n_lists is None:
        n_lists = max(4, int(emb.count() ** 0.5))
    cent = kmeans_centroids(emb, n_lists, lloyd_iters)
    assign = _nearest_lists(emb.select("vec_id", "v"), cent, "v", nprobe).select(
        "vec_id", "list_id"
    )
    cand = (
        assign.alias("a")
        .join(
            assign.alias("b"),
            (F.col("a.list_id") == F.col("b.list_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    va = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("v_a"), F.col("nv").alias("n_a")
    )
    vb = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("v_b"), F.col("nv").alias("n_b")
    )
    cos = _cosine(_dot("v_a", "v_b"), F.col("n_a"), F.col("n_b"))
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def connected_components(
    edges: DataFrame,
    max_iter: int = 20,
    driver_finish_max_edges: int = 2_000_000,
) -> DataFrame:
    """Connected components over an edge list with BOTH directions
    present (columns ``src``, ``dst``). Returns one (id, comp) row per
    node appearing in ``edges``, comp = the component's minimum node id.

    Hybrid execution — the shape every production CC pipeline uses:

    - **Small active graph** (≤ ``driver_finish_max_edges`` directed
      edges, ~32 MB of longs at the 2M default): one collect + a
      path-compressed union-find on the driver. Near-dup graphs are
      thresholded, so the active subgraph is normally a sliver of the
      corpus; paying 10+ distributed barriers to label a few thousand
      nodes is pure job-latency overhead (measured 8.6 s → ~0.1 s at
      sf0.1). The guard is an explicit edge COUNT, never a guess.
    - **Large active graph**: distributed min-label propagation with
      pointer jumping, O(log diameter) rounds of join + groupBy-min on
      the evenly-distributed id key. Lineage MUST be truncated per
      round, not just persisted: the union references the previous
      labels twice, so the logical plan doubles every iteration —
      persist() caches execution but Catalyst still renders the
      2^rounds plan (AQE's explain OOMed at round ~10 before this used
      localCheckpoint). The checkpoint is lazy: the convergence check
      is the materializing action, one Spark job per round. On a
      multi-executor cluster prefer df.checkpoint() with a reliable
      checkpoint dir so a lost executor can't kill a late round.
    """
    spark = edges.sparkSession
    n_edges = edges.count()
    if n_edges <= driver_finish_max_edges:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        nodes: set[int] = set()
        # one collect job — the guard bounds this to ~32 MB of longs;
        # toLocalIterator would pay one job + RPC round-trip PER
        # PARTITION (measured 4.4 s vs 0.3 s on 32 partitions)
        for src, dst in edges.select("src", "dst").collect():
            nodes.add(src)
            nodes.add(dst)
            ra, rb = find(src), find(dst)
            if ra != rb:  # union by min keeps comp = component min id
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        rows = [(n, find(n)) for n in sorted(nodes)]
        return spark.createDataFrame(rows, "id bigint, comp bigint")
    # Seed with the one-hop neighbor min folded into initialization —
    # every edge list with both directions present has every node as a
    # src, so one groupBy replaces the identity seed AND the would-be
    # first propagation round.
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("_nmin"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("_nmin")).alias("comp"),
        )
        .localCheckpoint()
    )

    def _jump(frame: DataFrame) -> DataFrame:
        # Resolve each label through its label's label. The self-join's
        # two references to `frame` share one physical evaluation
        # (ReuseExchange dedupes the identical aggregate subtree).
        return (
            frame.alias("l")
            .join(frame.alias("m"), F.col("l.comp") == F.col("m.id"), "left")
            .select(
                F.col("l.id").alias("id"),
                F.least(
                    F.col("l.comp"), F.coalesce(F.col("m.comp"), F.col("l.comp"))
                ).alias("comp"),
            )
        )

    # Convergence via the label-sum invariant: min-propagation only ever
    # DECREASES labels, so sum(comp) is strictly monotone until the
    # fixpoint — an unchanged sum certifies convergence without joining
    # new labels against old (one aggregate instead of a join + count,
    # and the same single materializing job per round).
    prev_sum = None
    converged = False
    for _ in range(max_iter):
        neighbor = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), F.col("comp")
        )
        stepped = labels.union(neighbor).groupBy("id").agg(F.min("comp").alias("comp"))
        # Two pointer jumps per round: label chains shorten 4× per
        # materialized round instead of 2×, halving the number of Spark
        # jobs — the dominant cost when rounds are latency-bound (local
        # mode) and a win at scale too (fewer barriers over the same
        # shuffle volume).
        labels = _jump(_jump(stepped)).localCheckpoint(eager=False)
        s = labels.agg(F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")).collect()[
            0
        ]["s"]
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components: not converged after {max_iter} rounds; "
            "labels may be partially propagated — raise max_iter "
            "(adversarially chain-shaped graphs need O(log diameter) rounds)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def dedup_clusters(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.4,
    max_iter: int = 20,
    edge_source: str = "lsh",
    bucket_cap: int | None = None,
    bits: int | None = None,
    bands: int | None = None,
) -> DataFrame:
    """Connected-components clustering over near-duplicate pairs — the
    step a training-data dedup pipeline runs AFTER pair generation:
    collapse pairwise matches into clusters so each group keeps one
    canonical document (cluster_id = min vec_id in the component;
    singletons are their own cluster).

    Pairs come from the embedding-cosine near-dup join (deterministic,
    so the whole operator stays oracle-checkable against a DuckDB
    recursive-CTE transitive closure).

    Algorithm: distributed min-label propagation. Each round is one
    join (neighbor labels) + one groupBy-min — two shuffles on the
    evenly-distributed id key; rounds = graph diameter. Near-dup
    graphs are dense blobs with tiny diameters (2-4 rounds in
    practice), and the pair generator's similarity threshold bounds
    component fan-in, so this converges fast at any corpus size. For
    adversarially chain-shaped graphs the alternating small-star /
    large-star variant (Kiveris et al., "Connected Components in
    MapReduce and Beyond") drops rounds to O(log n) — same per-round
    plan shape, so it slots in without changing the contract. The loop
    itself is the reusable :func:`connected_components` primitive (see
    its docstring for the lineage-truncation requirement).

    ``edge_source``: ``"lsh"`` (default) generates edges with the
    banded-LSH block-then-verify join — the 100 TB path, no corpus
    broadcast, no quadratic join; ``"exact"`` uses the all-pairs twin,
    kept for the small-SF oracle comparison (its DuckDB recursive-CTE
    transitive closure needs the exhaustive pair list).
    """
    if edge_source == "lsh":
        pairs = embedding_near_dups_lsh(
            spark, sf_dir, threshold, bits=bits, bands=bands, bucket_cap=bucket_cap
        ).select("vec_a", "vec_b")
    elif edge_source == "exact":
        pairs = embedding_near_dups(spark, sf_dir, threshold).select("vec_a", "vec_b")
    else:
        raise ValueError(f"edge_source must be lsh|exact, got {edge_source!r}")
    # Both edge directions from ONE pass over the pair join (a
    # union-with-swap would evaluate the cosine self-join twice).
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")),
                    F.struct(F.col("vec_b").alias("src"), F.col("vec_a").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .persist()
    )

    # Propagate only over the ACTIVE subgraph (nodes that matched some
    # pair). After thresholding, active nodes ≪ corpus — the loop never
    # touches the full table; singletons rejoin map-side at the end.
    labels = connected_components(edges, max_iter)
    edges.unpersist()
    # embedding_near_dups persists its pair frame so CacheManager can
    # share the cosine self-join with q_dedup_embedding; labels are
    # materialized (collect or localCheckpoint) by now, so release it —
    # leaving it cached would accumulate partitions across repeated
    # registry invocations in one session (VERDICT r2 finding #2).
    if edge_source == "exact" and pairs.is_cached:
        pairs.unpersist()

    sizes = labels.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    clustered = labels.join(sizes, "comp").select(
        F.col("id").alias("vec_id"),
        F.col("comp").alias("cluster_id"),
        F.col("cluster_size"),
    )
    nodes = io.read_table(spark, sf_dir, "embeddings").select("vec_id")
    return (
        # no broadcast hint: the active set is usually tiny (AQE will
        # broadcast it), but a pathological dup-rate could make it
        # corpus-sized — let runtime stats decide.
        nodes.join(clustered, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("cluster_id"), F.col("vec_id")).alias("cluster_id"),
            F.coalesce(F.col("cluster_size"), F.lit(1)).cast("bigint").alias("cluster_size"),
        )
        .orderBy("vec_id")
    )


DEDUP_CLUSTERS_SQL = """
WITH RECURSIVE v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
), n AS (
    SELECT vec_id, v,
           sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nv
    FROM v
), pairs AS (
    SELECT a.vec_id AS va, b.vec_id AS vb
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE round(list_aggregate(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]), 'sum')
                / (a.nv * b.nv), 6) >= 0.4
), edges AS (
    SELECT va AS src, vb AS dst FROM pairs
    UNION ALL
    SELECT vb, va FROM pairs
), reach(id, root) AS (
    SELECT vec_id, vec_id FROM v
    UNION
    SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
), comp AS (
    SELECT id AS vec_id, min(root) AS cluster_id FROM reach GROUP BY id
)
SELECT vec_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM comp
ORDER BY vec_id
"""


EMBEDDING_NEAR_DUPS_SQL = """
WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
), n AS (
    SELECT vec_id, v,
           sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nv
    FROM v
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_aggregate(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]), 'sum')
             / (a.nv * b.nv), 6) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE round(list_aggregate(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]), 'sum')
            / (a.nv * b.nv), 6) >= 0.4
ORDER BY vec_a, vec_b
"""


def _hex8_int(col: str) -> str:
    """DuckDB expression: first 8 hex chars of ``col`` as an integer
    (portable positional strpos arithmetic — no from_hex/conv needed)."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({col}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )


def _lsh_cte(
    threshold: float,
    bits: int,
    bands: int,
    seed: int,
    bucket_cap: int | None = None,
) -> str:
    """WITH-clause body replaying the banded sign-LSH pair generator in
    DuckDB: portable hyperplanes (same md5→Box-Muller derivation as
    :func:`_portable_hyperplanes`), per-(vector, plane) sign dots, band
    bucket packing, bucket-join candidates, exact-cosine verify.
    Yields a ``pairs(vec_a, vec_b, cosine)`` CTE. MATERIALIZED
    throughout — every stage is referenced downstream and DuckDB's
    inlining would re-run the hyperplane cross join per reference.

    ``bucket_cap`` replays the Spark side's opt-in occupancy filter
    (:func:`embedding_near_dups_lsh`): over-cap (band, bucket) groups
    are dropped BEFORE the candidate self-join, so a capped deployment
    plan certifies against an oracle that misses the same pairs by
    construction — the same replay-the-approximation principle the
    pinned banding itself uses."""
    n_planes = bands * bits
    cand_src = "buckets"
    cap_cte = ""
    if bucket_cap is not None:
        cand_src = "buckets_capped"
        cap_cte = f""", buckets_capped AS MATERIALIZED (
    SELECT vec_id, band, bucket FROM buckets
    QUALIFY count(*) OVER (PARTITION BY band, bucket) <= {bucket_cap}
)"""
    return f"""v0 AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
), n AS MATERIALIZED (
    SELECT vec_id, v,
           sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS nv
    FROM v0
), u AS (
    SELECT pp.p, dd.d,
           md5('{seed}:' || CAST(pp.p AS VARCHAR) || ':' || CAST(dd.d AS VARCHAR) || ':a') AS ha,
           md5('{seed}:' || CAST(pp.p AS VARCHAR) || ':' || CAST(dd.d AS VARCHAR) || ':b') AS hb
    FROM generate_series(0, {n_planes - 1}) pp(p)
    CROSS JOIN generate_series(0, 63) dd(d)
), hplanes AS MATERIALIZED (
    SELECT p, d,
           sqrt(-2.0 * ln((({_hex8_int('ha')}) + 0.5) / 4294967296.0))
           * cos(2.0 * pi() * ((({_hex8_int('hb')}) + 0.5) / 4294967296.0)) AS hval
    FROM u
), dots AS MATERIALIZED (
    SELECT e.vec_id, h.p, sum(e.v[h.d + 1] * h.hval) AS dot
    FROM n e JOIN hplanes h ON h.d < len(e.v)
    GROUP BY e.vec_id, h.p
), buckets AS MATERIALIZED (
    SELECT vec_id, (p // {bits}) AS band,
           CAST(sum(CASE WHEN dot >= 0.0 THEN (CAST(1 AS BIGINT) << (p % {bits})) ELSE 0 END) AS BIGINT) AS bucket
    FROM dots GROUP BY vec_id, (p // {bits})
){cap_cte}, cand AS MATERIALIZED (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM {cand_src} a JOIN {cand_src} b
      ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
), pairs AS MATERIALIZED (
    SELECT vec_a, vec_b, cosine FROM (
        SELECT c.vec_a, c.vec_b,
               round(list_aggregate(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]), 'sum')
                     / (a.nv * b.nv), 6) AS cosine
        FROM cand c
        JOIN n a ON a.vec_id = c.vec_a
        JOIN n b ON b.vec_id = c.vec_b
    ) WHERE cosine >= {threshold}
)"""


def lsh_pairs_sql(threshold: float, bits: int, bands: int, seed: int = 7) -> str:
    """Full DuckDB twin of :func:`embedding_near_dups_lsh` at PINNED
    (bits, bands): the oracle replays the approximation itself, so
    certification no longer depends on banding recall being total —
    both engines miss the same borderline pairs by construction."""
    return f"""
WITH {_lsh_cte(threshold, bits, bands, seed)}
SELECT vec_a, vec_b, cosine FROM pairs ORDER BY vec_a, vec_b
"""


# The cluster family's certified registered tuning: threshold 0.4 over
# 5-bit × 38-band signatures — the n-free tuning, identical to the
# footer-adaptive default at every certification SF (the size floor
# engages only past n=4096). Consumers that pin the banding (registry,
# curation) import these instead of re-pinning literals, so the pinned
# parameters cannot desynchronize from the certified family.
LSH_THRESHOLD = 0.4
LSH_BITS = 5
LSH_BANDS = 38

EMBEDDING_LSH_SQL = lsh_pairs_sql(LSH_THRESHOLD, bits=LSH_BITS, bands=LSH_BANDS)


def _lsh_closure_with(
    threshold: float,
    bits: int,
    bands: int,
    seed: int,
    bucket_cap: int | None = None,
) -> str:
    """WITH-clause prefix shared by the cluster-family LSH oracles: the
    LSH-replayed pair CTE (:func:`_lsh_cte` at PINNED params) feeding
    the recursive transitive closure. Ends at ``comp(vec_id,
    cluster_id)`` — every embedding seeds `reach`, so singletons keep
    their own id as cluster_id, matching the Spark side's left-join +
    coalesce over the full vector table."""
    return f"""WITH RECURSIVE {_lsh_cte(threshold, bits, bands, seed, bucket_cap)},
edges AS (
    SELECT vec_a AS src, vec_b AS dst FROM pairs
    UNION ALL
    SELECT vec_b, vec_a FROM pairs
), reach(id, root) AS (
    SELECT vec_id, vec_id FROM v0
    UNION
    SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
), comp AS (
    SELECT id AS vec_id, min(root) AS cluster_id FROM reach GROUP BY id
)"""


def dedup_clusters_lsh_sql(
    threshold: float, bits: int, bands: int, seed: int = 7
) -> str:
    """Full DuckDB twin of :func:`dedup_clusters` with the LSH edge
    source at PINNED (bits, bands): the transitive closure runs over
    the REPLAYED banding pairs, not the exact all-pairs list, so both
    engines miss the same borderline pairs by construction and the
    certification no longer depends on banding recall being total
    (VERDICT r5: the exact-closure oracle went red the moment one
    borderline pair slipped a band at sf0.01)."""
    return f"""
{_lsh_closure_with(threshold, bits, bands, seed)}
SELECT vec_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM comp
ORDER BY vec_id
"""


def cluster_split_lsh_sql(
    threshold: float,
    bits: int,
    bands: int,
    seed: int = 7,
    train_256: int = 204,
    val_256: int = 230,
    bucket_cap: int | None = None,
) -> str:
    """DuckDB twin of :func:`cluster_split` with the LSH edge source at
    PINNED (bits, bands) — :func:`dedup_clusters_lsh_sql`'s closure
    plus the md5(cluster_id) bucket map. ``bucket_cap`` replays the
    deployment occupancy filter inside the pair CTE (see
    :func:`_lsh_cte`)."""
    return f"""
{_lsh_closure_with(threshold, bits, bands, seed, bucket_cap)},
sized AS (
    SELECT vec_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM comp
), bucketed AS (
    SELECT vec_id, cluster_id, cluster_size,
           (strpos('0123456789abcdef', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5(CAST(cluster_id AS VARCHAR)), 2, 1)) - 1) AS bucket
    FROM sized
)
SELECT vec_id, cluster_id, cluster_size,
       CASE WHEN bucket < {train_256} THEN 'train'
            WHEN bucket < {val_256} THEN 'val'
            ELSE 'test' END AS split
FROM bucketed
ORDER BY vec_id
"""


# the registered cluster-family params: same pinned (5 bits × 38 bands)
# as q_dedup_embedding — one shared LSH pair materialization serves the
# pair, cluster, split, and graph queries in a session
DEDUP_CLUSTERS_LSH_SQL = dedup_clusters_lsh_sql(
    LSH_THRESHOLD, bits=LSH_BITS, bands=LSH_BANDS
)
CLUSTER_SPLIT_LSH_SQL = cluster_split_lsh_sql(
    LSH_THRESHOLD, bits=LSH_BITS, bands=LSH_BANDS
)


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-based canonical selection: within each exact-dup group,
    keep the LONGEST copy (ties → lowest doc_id) instead of the lowest
    id — the "keep the best representative" policy a training-data
    dedup actually wants (longest text, highest quality score, newest
    crawl — same plan, different struct ordering).

    max(struct(n_chars, -doc_id)) is a single partial-aggregable
    expression — one shuffle of one small struct per group, no window,
    no second pass. (A row_number window would sort every group; the
    struct-max is the map-side-combinable form.)
    """
    docs = normalized_docs(spark, sf_dir)
    best = F.max(
        F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))
    ).alias("b")
    return (
        docs.select(F.md5("norm").alias("fingerprint"), "doc_id", "n_chars")
        .groupBy("fingerprint")
        .agg(best, F.count("*").alias("copies"))
        .select(
            "fingerprint",
            (-F.col("b.neg_id")).cast("bigint").alias("keep_doc_id"),
            F.col("b.n_chars").alias("kept_chars"),
            "copies",
        )
        .orderBy("fingerprint")
    )


DEDUP_KEEP_BEST_SQL = r"""
WITH fp AS (
    SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), '\s+', ' ', 'g'))) AS fingerprint,
           doc_id, n_chars
    FROM documents
), ranked AS (
    SELECT fingerprint, doc_id, n_chars,
           row_number() OVER (PARTITION BY fingerprint
                              ORDER BY n_chars DESC, doc_id) AS rn,
           count(*) OVER (PARTITION BY fingerprint) AS copies
    FROM fp
)
SELECT fingerprint, doc_id AS keep_doc_id, n_chars AS kept_chars,
       CAST(copies AS BIGINT) AS copies
FROM ranked WHERE rn = 1
ORDER BY fingerprint
"""
