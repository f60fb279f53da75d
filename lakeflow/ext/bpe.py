"""Iterative BPE merge learning over the documents corpus.

The iterative-algorithm extension point: `q_char_pairs` (text.py)
computes the FIRST merge round's pair statistics; this module runs the
actual training loop — R rounds of (count adjacent symbol pairs →
pick the argmax pair → apply the merge corpus-wide) — the way a
tokenizer-vocabulary build runs over a training corpus.

Reference scope: the reference has no tokenizer surface; this extends
the text-analysis family (SURVEY §2.13) with the canonical iterative
corpus algorithm.

Scale design:
- The loop state is the WORD-FREQUENCY table (vocabulary-sized, not
  corpus-sized): one `explode → groupBy word` reduces 100 TB of text to
  a few million rows once, and every merge round then runs on that
  small relation — one pair-count shuffle per round, a 1-row argmax to
  the driver (the merge rule IS driver state in every BPE trainer), and
  a map-only `replace` to apply it. Rounds are sequential by nature;
  per-round cost is O(vocab), not O(corpus).
- Each round's state is persisted and the previous round unpersisted —
  without this the lineage replays all prior merges per action
  (O(R²) work; the same lineage-truncation discipline as the
  connected-components loop in dedup.py).
- Merge application is a single non-overlapping left-to-right string
  `replace` on a PAREN-WRAPPED symbol string: '(a)(b)(a)(b)'. With a
  space-separated representation, adjacent pattern occurrences SHARE
  the boundary space, so one replace pass merges only alternate
  occurrences (' a b a b ' → ' ab a b ' — not textbook BPE and needs
  an unbounded number of passes). Paren-wrapping gives each occurrence
  disjoint characters: '(a)(b)(a)(b)' → '(ab)(ab)' in one pass, while
  true self-overlap still resolves greedily ('(a)(a)(a)' → '(aa)(a)').
  Spark and DuckDB implement identical scan semantics (verified on both
  cases), so the unrolled-CTE DuckDB oracle reproduces the learned
  merge table bit-for-bit. Symbols are [a-z0-9]+ (normalized tier), so
  parens can never appear inside a symbol.
- Ties on pair frequency break by lexicographically smallest pair —
  deterministic across engines (ASCII collation both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_ROUNDS = 8


def _word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary with corpus frequencies from the normalized-text tier."""
    from lakeflow.ext.dedup import normalized_docs, tokenized

    docs = normalized_docs(spark, sf_dir)
    return (
        tokenized(docs)
        .select(F.explode("tokens").alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _learn(
    words: DataFrame, rounds: int
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """The training loop. Returns (merge rules, FINAL vocabulary state
    (word, r=segmented repr, freq) — persisted; caller unpersists)."""
    state = words.select(
        "word", F.regexp_replace("word", "(.)", "($1)").alias("r"), "freq"
    ).persist()
    prev = None
    merges: list[tuple[int, str, str, str, int]] = []
    for rnd in range(1, rounds + 1):
        syms = state.select(
            F.split(
                F.regexp_replace("r", r"^\(|\)$", ""), r"\)\("
            ).alias("sy"),
            "freq",
        ).filter(F.size("sy") > 1)
        pairs = syms.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(sy) - 1),"
                    " i -> concat(element_at(sy, i), ' ', element_at(sy, i + 1)))"
                )
            ).alias("pair"),
            "freq",
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").alias("f"))
            .orderBy(F.desc("f"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, f = top[0]["pair"], int(top[0]["f"])
        left, right = pair.split(" ")
        merges.append((rnd, left, right, left + right, f))
        nxt = state.select(
            "word",
            F.replace(
                F.col("r"),
                F.lit(f"({left})({right})"),
                F.lit(f"({left}{right})"),
            ).alias("r"),
            "freq",
        ).persist()
        nxt.count()  # materialize before dropping the parent
        if prev is not None:
            prev.unpersist()
        prev, state = state, nxt
    if prev is not None and prev is not state:
        prev.unpersist()
    return merges, state


def bpe_merges(
    spark: SparkSession, sf_dir: str, rounds: int = DEFAULT_ROUNDS
) -> DataFrame:
    """Learn the first ``rounds`` BPE merge rules; returns one row per
    round: (round, left_sym, right_sym, merged, freq).
    """
    merges, state = _learn(_word_freqs(spark, sf_dir), rounds)
    state.unpersist()
    return spark.createDataFrame(
        merges, "round int, left_sym string, right_sym string, merged string, freq bigint"
    ).orderBy("round")


def bpe_apply(
    spark: SparkSession, sf_dir: str, rounds: int = DEFAULT_ROUNDS
) -> DataFrame:
    """Train-then-apply: learn the merge table, then segment the WHOLE
    corpus with it and report per-language compression stats —
    (lang, docs, words, symbols, symbols_per_word). The number a
    tokenizer build actually optimizes (symbols/word falls as merges
    land) and the judge of whether merges learned on the pooled corpus
    transfer to each language.

    Scale shape: the segmentation lives on the VOCABULARY (word →
    symbol count, one small relation), so applying it corpus-wide is a
    broadcast join against the exploded word instances — no corpus-side
    string work at all; the R replace passes never touch the corpus,
    only the vocab. This is the standard trainer trick (run on word
    counts, not raw text) surfaced end-to-end.
    """
    from lakeflow.ext.dedup import normalized_docs, tokenized
    from pyspark.sql.functions import broadcast

    docs = normalized_docs(spark, sf_dir)
    inst = (
        tokenized(docs, "lang")
        .select("doc_id", "lang", F.explode("tokens").alias("word"))
        .filter(F.col("word") != "")
    )
    _, state = _learn(inst.groupBy("word").agg(F.count("*").alias("freq")), rounds)
    # materialize the tiny vocab eagerly (truncates the R-round replace
    # lineage) so the training state can be unpersisted before the
    # caller ever evaluates the returned frame
    vocab = state.select(
        "word",
        F.size(
            F.split(F.regexp_replace("r", r"^\(|\)$", ""), r"\)\(")
        ).alias("n_sym"),
    ).localCheckpoint()
    state.unpersist()
    return (
        inst.join(broadcast(vocab), "word")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("docs"),
            F.count("*").cast("bigint").alias("words"),
            F.sum("n_sym").cast("bigint").alias("symbols"),
            F.round(F.sum("n_sym") / F.count("*"), 6).alias("symbols_per_word"),
        )
        .orderBy("lang")
    )


def _bpe_oracle_sql(rounds: int = DEFAULT_ROUNDS) -> str:
    """Unrolled-loop DuckDB twin: each round is a (top-pair, re-written
    corpus) CTE pair; the rounds UNION into the merge table."""
    ctes = [
        """words AS (
    SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
        SELECT unnest(string_split_regex(
            trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g')),
            '\\s+')) AS word
        FROM documents WHERE text IS NOT NULL
    ) WHERE word <> '' GROUP BY word
)""",
        "w0 AS (SELECT word, regexp_replace(word, '(.)', '(\\1)', 'g') AS r, freq FROM words)",
    ]
    selects = []
    for i in range(1, rounds + 1):
        ctes.append(
            f"""p{i} AS (
    SELECT pair, CAST(sum(freq) AS BIGINT) AS f FROM (
        SELECT unnest(list_transform(range(1, len(sy)), j -> sy[j] || ' ' || sy[j + 1])) AS pair, freq
        FROM (SELECT string_split(regexp_replace(r, '^\\(|\\)$', '', 'g'), ')(') AS sy, freq FROM w{i - 1})
    ) GROUP BY pair ORDER BY f DESC, pair ASC LIMIT 1
)"""
        )
        ctes.append(
            f"""w{i} AS (
    SELECT word, replace(w{i - 1}.r,
                   '(' || replace(p{i}.pair, ' ', ')(') || ')',
                   '(' || replace(p{i}.pair, ' ', '') || ')') AS r, freq
    FROM w{i - 1}, p{i}
)"""
        )
        selects.append(
            f"SELECT {i} AS round, split_part(pair, ' ', 1) AS left_sym,"
            f" split_part(pair, ' ', 2) AS right_sym,"
            f" replace(pair, ' ', '') AS merged, f AS freq FROM p{i}"
        )
    return "WITH " + ",\n".join(ctes), selects


def _merges_sql(rounds: int = DEFAULT_ROUNDS) -> str:
    prefix, selects = _bpe_oracle_sql(rounds)
    return prefix + "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY round"


def _apply_sql(rounds: int = DEFAULT_ROUNDS) -> str:
    prefix, _ = _bpe_oracle_sql(rounds)
    return (
        prefix
        + f""",
inst AS (
    SELECT doc_id, lang, unnest(string_split_regex(
        trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g')),
        '\\s+')) AS word
    FROM documents WHERE text IS NOT NULL
),
vocab AS (
    SELECT word,
           len(string_split(regexp_replace(r, '^\\(|\\)$', '', 'g'), ')(')) AS n_sym
    FROM w{rounds}
)
SELECT lang,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS docs,
       CAST(count(*) AS BIGINT) AS words,
       CAST(sum(n_sym) AS BIGINT) AS symbols,
       round(CAST(sum(n_sym) AS DOUBLE) / count(*), 6) AS symbols_per_word
FROM inst JOIN vocab USING (word)
WHERE word <> ''
GROUP BY lang ORDER BY lang
"""
    )


BPE_MERGES_SQL = _merges_sql()
BPE_APPLY_SQL = _apply_sql()
