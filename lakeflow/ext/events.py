"""Event-stream analytics over the `events` table (batch-first).

The reference fakes recency with wall-clock predicates + hourly Airflow
runs (SURVEY.md §2.10); here we provide real event-time operators —
tumbling windows, sessionization, JSON prop extraction — as batch
DataFrame programs whose streaming twins (readStream + withWatermark)
live in lakeflow.streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakeflow import io


def tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window counts/sums per event_type.

    Batch `F.window` — identical grouping to the streaming variant, so
    it doubles as the oracle-checkable twin. Epoch-aligned buckets match
    DuckDB's time_bucket. The `value` sum goes through decimal(18,6) for
    order-independent exactness.
    """
    ev = io.read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("events"),
            F.countDistinct("user_id").alias("unique_users"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "events",
            "unique_users",
            "total_value",
        )
        .orderBy("bucket_start", "event_type")
    )


TUMBLING_SQL = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket_start,
       event_type,
       COUNT(*) AS events,
       COUNT(DISTINCT user_id) AS unique_users,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


def props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — JSON prop extraction (`props` is a JSON string column)."""
    ev = io.read_table(spark, sf_dir, "events")
    # try_cast: a STRING-valued k (or other non-numeric) yields NULL
    # instead of an ANSI CAST_INVALID_INPUT job abort — found by the
    # random-corpus fuzz gate; the SQL twin mirrors with TRY_CAST
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").try_cast("int").alias("prop_k"),
    )


PROPS_SQL = """
SELECT event_id, event_type,
       TRY_CAST(props->>'$.k' AS INTEGER) AS prop_k
FROM events
"""


def sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: lag(ts) + cumulative new-session flags.

    Two windows over the same (user_id, ts) partitioning — one shuffle
    total; at scale this is the standard batch sessionizer (the
    streaming twin is session_window in lakeflow.streaming).
    """
    ev = io.read_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(f"INTERVAL {gap_minutes} MINUTES")
    with_flag = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(by_user).isNull()
            | (F.col("ts") - F.lag("ts").over(by_user) > gap),
            1,
        ).otherwise(0),
    )
    with_sid = with_flag.withColumn(
        "session_seq",
        F.sum("new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("events_in_session"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_seq")
    )


SESSIONIZE_SQL = """
WITH flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sid AS (
    SELECT user_id, ts,
           CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
    FROM flagged
)
SELECT user_id, session_seq,
       COUNT(*) AS events_in_session,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end
FROM sid
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


def session_window_counts(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions via Spark's built-in session_window (the same
    state-store operator the streaming twin uses — see
    lakeflow.streaming.session_counts_stream). Semantically identical to
    the lag-based sessionize above, so the oracle reuses its CTE chain:
    session_window.start == MIN(ts) of the lag-defined session."""
    ev = io.read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("sw"),
            F.col("user_id"),
        )
        .agg(F.count("*").alias("events_in_session"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "events_in_session",
        )
        .orderBy("user_id", "session_start")
    )


SESSION_WINDOW_SQL = """
WITH flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sid AS (
    SELECT user_id, ts,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       COUNT(*) AS events_in_session
FROM sid
GROUP BY user_id, session_seq
ORDER BY user_id, session_start
"""


def props_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5b — full JSON → typed MapType → explode → aggregate: the
    schema-on-read path for semi-structured props (get_json_object
    above is the single-key fast path; this one handles arbitrary
    key sets in one pass)."""
    ev = io.read_table(spark, sf_dir, "events")
    kv = ev.select(
        "event_type",
        F.explode(F.from_json("props", "map<string,int>")).alias("key", "val"),
    )
    return (
        kv.groupBy("event_type", "key")
        .agg(
            F.count("*").alias("n"),
            F.sum("val").alias("total"),
            F.min("val").alias("vmin"),
            F.max("val").alias("vmax"),
        )
        .orderBy("event_type", "key")
    )


PROPS_MAP_SQL = """
SELECT event_type, k AS key,
       COUNT(*) AS n,
       CAST(SUM(CAST(props->>k AS INTEGER)) AS BIGINT) AS total,
       MIN(CAST(props->>k AS INTEGER)) AS vmin,
       MAX(CAST(props->>k AS INTEGER)) AS vmax
FROM events, UNNEST(json_keys(props)) AS t(k)
GROUP BY event_type, k
ORDER BY event_type, k
"""


def rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate (hypertable-style) rollup: the hourly
    tumbling buckets re-aggregated to daily resolution. At scale the
    hourly tier is the materialized continuous aggregate and the daily
    tier reads IT, not the raw events — ~24× less input; expressed here
    exactly that way (daily is derived from the hourly frame)."""
    hourly = tumbling_counts(spark, sf_dir)
    return (
        hourly.groupBy(
            F.date_trunc("day", "bucket_start").cast("date").alias("day_start"), F.col("event_type")
        )
        .agg(
            F.sum("events").alias("events"),
            F.sum(F.col("total_value").cast("decimal(18,6)")).cast("double").alias(
                "total_value"
            ),
            F.max("unique_users").alias("peak_hourly_users"),
        )
        .orderBy("day_start", "event_type")
    )


ROLLUP_DAILY_SQL = """
WITH hourly AS (
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket_start,
           event_type,
           COUNT(*) AS events,
           COUNT(DISTINCT user_id) AS unique_users,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
)
SELECT date_trunc('day', bucket_start) AS day_start,
       event_type,
       CAST(SUM(events) AS BIGINT) AS events,
       CAST(SUM(CAST(total_value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       CAST(MAX(unique_users) AS BIGINT) AS peak_hourly_users
FROM hourly
GROUP BY 1, 2 ORDER BY 1, 2
"""


def funnel(
    spark: SparkSession,
    sf_dir: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered-step funnel conversion: for each user, step k counts only
    if it happens strictly AFTER the user's step k-1 time (earliest
    qualifying event per step). Returns per-step reached-user counts and
    conversion ratios.

    Plan shape: ONE shuffle (groupBy user_id) computing all step times
    in a single aggregation — step k's time is the conditional min over
    the rows, chained with min_by-free nested aggregation via a sorted
    event-list fold:

    events are collected per user as a sorted (ts, type) array (bounded:
    per-user event counts, same state bound a sessionizer has), then the
    step times fall out of ONE array fold (aggregate), all JVM-side.
    At 100 TB this is the standard funnel shape: shuffle keyed by user,
    per-user work linear in their event count, final global aggregate is
    |steps| rows.
    """
    ev = io.read_table(spark, sf_dir, "events")
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_type").alias("et")))
    )
    per_user = ev.groupBy("user_id").agg(pairs.alias("evs"))

    # fold once over the sorted events: acc = array of step times (NULL
    # until reached); event advances the FIRST unreached step it matches
    # and that is strictly after the previous step's time
    n = len(steps)
    ts_type = dict(ev.dtypes)["ts"]  # ntz from driver parquet, plain ts in fixtures
    init = F.array(*[F.lit(None).cast(ts_type) for _ in steps])

    def advance(acc: F.Column, e: F.Column) -> F.Column:
        out = acc
        for k in range(n):
            prev_ok = F.lit(True) if k == 0 else F.element_at(out, k).isNotNull() & (
                e["ts"] > F.element_at(out, k)
            )
            hit = (
                (e["et"] == F.lit(steps[k]))
                & F.element_at(out, k + 1).isNull()
                & prev_ok
            )
            out = F.when(
                hit,
                F.concat(
                    F.slice(out, 1, k),
                    F.array(e["ts"]),
                    F.slice(out, k + 2, n - k - 1),
                ),
            ).otherwise(out)
        return out

    stepped = per_user.select(
        "user_id", F.aggregate("evs", init, advance).alias("t")
    )
    aggs = [
        F.count(F.when(F.element_at("t", k + 1).isNotNull(), 1)).alias(
            f"reached_{steps[k]}"
        )
        for k in range(n)
    ]
    out = stepped.agg(*aggs)
    # nullif-style guard: zero users at step 0 means conversion is
    # undefined (ANSI division would abort the job), NULL in both engines
    convs = [
        F.round(
            F.when(
                F.col(f"reached_{steps[0]}") > 0,
                F.col(f"reached_{steps[k]}") / F.col(f"reached_{steps[0]}"),
            ),
            6,
        ).alias(f"conv_{steps[k]}")
        for k in range(1, n)
    ]
    return out.select("*", *convs)


FUNNEL_SQL = """
WITH s1 AS (
    SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
), s3 AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM s1) AS reached_view,
       (SELECT COUNT(*) FROM s2) AS reached_click,
       (SELECT COUNT(*) FROM s3) AS reached_purchase,
       round((SELECT COUNT(*) FROM s2) / nullif((SELECT COUNT(*) FROM s1), 0), 6) AS conv_click,
       round((SELECT COUNT(*) FROM s3) / nullif((SELECT COUNT(*) FROM s1), 0), 6) AS conv_purchase
"""


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-cohort retention matrix: users bucketed by first-active day,
    counted once per (cohort, day-offset) they return on.

    Two shuffles, both keyed by user_id (first-seen aggregate, then the
    activity join) — AQE coalesces the tiny (cohort, offset) final
    aggregate. The same shape at 100 TB: the user-keyed join is the
    dominant exchange and it is exactly one pass over events.
    """
    ev = io.read_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").cast("int").alias("day_offset"),
        )
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("bigint").alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


RETENTION_SQL = """
WITH ev AS (
    SELECT user_id, CAST(ts AS DATE) AS day FROM events
), first AS (
    SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id
), act AS (
    SELECT DISTINCT ev.user_id, first.cohort_day,
           CAST(date_diff('day', first.cohort_day, ev.day) AS INTEGER) AS day_offset
    FROM ev JOIN first ON ev.user_id = first.user_id
)
SELECT cohort_day, day_offset, COUNT(*) AS active_users
FROM act GROUP BY cohort_day, day_offset ORDER BY cohort_day, day_offset
"""


def anomaly_zscore(
    spark: SparkSession, sf_dir: str, threshold: float = 3.0
) -> DataFrame:
    """Per-event-type z-score outliers — the cheap first-pass anomaly
    filter of a telemetry/quality pipeline. Two passes expressed as one
    aggregate + one broadcast join back (group stats are |event_types|
    rows); the events table itself is scanned twice but never shuffled
    on the data path."""
    from pyspark.sql.functions import broadcast

    ev = io.read_table(spark, sf_dir, "events")
    # mu/sigma from EXACT decimal sums (value is ≤6dp), not avg/stddev:
    # float aggregation order differs between engines and partitionings,
    # and an ulp of drift in sigma can flip rows sitting on the
    # threshold — exact sums make the stats bit-identical everywhere.
    dv = F.col("value").cast("decimal(18,6)")
    stats = ev.groupBy("event_type").agg(
        F.sum(dv).cast("double").alias("s1"),
        F.sum(dv * dv).cast("double").alias("s2"),
        F.count("value").alias("n"),
    ).select(
        "event_type",
        (F.col("s1") / F.col("n")).alias("mu"),
        # n=1 groups have no sample variance (ANSI: (n-1)=0 would abort
        # the job); sigma NULL -> z NULL -> row filtered, in BOTH engines.
        # greatest(0, ...): the sums are exact but the DOUBLE expression
        # s2 - s1²/n can land at -1ulp on a zero-variance group
        # (catastrophic cancellation) — Spark would yield sigma=NaN while
        # DuckDB ABORTS on sqrt(negative); the clamp makes both engines
        # yield sigma=0 -> filtered (fuzz-found, constant-value groups)
        F.when(
            F.col("n") > 1,
            F.sqrt(
                F.greatest(
                    F.lit(0.0),
                    F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"),
                )
                / (F.col("n") - 1)
            ),
        ).alias("sigma"),
    )
    # sigma=0 (constant group): z undefined, not an outlier
    z = F.when(
        F.col("sigma") > 0, (F.col("value") - F.col("mu")) / F.col("sigma")
    )
    # integer micro-unit z (floor(z*1e6 + 0.5) — the certified
    # quantile_hist/abtt/PageRank pattern): z is a sqrt-derived float
    # chain, exactly the class where engine-native ROUND half-boundary
    # behavior diverges (Spark BigDecimal HALF_UP vs DuckDB float
    # round, VERDICT r9 #2). The threshold ALSO compares the quantized
    # value in both engines — the previous code filtered Spark on the
    # ROUNDED z but the oracle on the RAW z, so a raw |z| of 2.9999996
    # survived one engine and not the other (latent row-count bug,
    # found in the r10 round-site audit before the fuzzer did).
    z_micro = F.floor(z * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    return (
        ev.join(broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z_micro.alias("zscore_micro"))
        .filter(F.abs(F.col("zscore_micro")) >= int(threshold * 1_000_000))
        .orderBy("event_type", "event_id")
    )


ANOMALY_SQL = """
WITH sums AS (
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
           -- DECIMAL(19,6) x DECIMAL(19,6) -> DECIMAL(38,12): the widest
           -- product DuckDB's p1+p2 rule allows; 18+18=36 wide ops overflow
           -- the engine's DECIMAL(18) fast path at |value| >= 1000
           CAST(SUM(CAST(value AS DECIMAL(19,6)) * CAST(value AS DECIMAL(19,6))) AS DOUBLE) AS s2,
           COUNT(value) AS n
    FROM events GROUP BY event_type
), stats AS (
    SELECT event_type, s1 / n AS mu,
           CASE WHEN n > 1
                THEN sqrt(greatest(0, s2 - s1 * s1 / n) / (n - 1)) END AS sigma
    FROM sums
)
SELECT event_id, e.event_type, value,
       CAST(FLOOR((value - mu) / sigma * 1e6 + 0.5) AS BIGINT) AS zscore_micro
FROM events e JOIN stats USING (event_type)
WHERE sigma > 0
  AND abs(CAST(FLOOR((value - mu) / sigma * 1e6 + 0.5) AS BIGINT)) >= 3000000
ORDER BY event_type, event_id
"""


def attribution(spark: SparkSession, sf_dir: str, window_minutes: int = 60) -> DataFrame:
    """View→purchase attribution: for every purchase, count the same
    user's views in the preceding hour (classic conversion-window
    stream-stream join; streaming twin: lakeflow.streaming
    .attribution_stream).

    Equi-key on user_id + a time-range bound — Catalyst plans a hash
    join on the equi key with the range as a post-join predicate, never
    a cartesian product. Purchases with no prior view survive via the
    left join (conversion rate needs the zero rows). Both sides come
    from one events scan (the persisted fan-out cache serves both
    filters; at production scale these are two pruned column scans).
    """
    ev = io.read_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (purchases.user_id == views.v_user)
        & (views.v_ts >= purchases.purchase_ts - F.expr(f"INTERVAL {window_minutes} MINUTES"))
        & (views.v_ts < purchases.purchase_ts)
    )
    return (
        purchases.join(views, cond, "left")
        .groupBy("purchase_id", "user_id", "purchase_ts", "purchase_value")
        .agg(F.count("v_ts").alias("views_prior"))
        .orderBy("purchase_id")
    )


ATTRIBUTION_SQL = """
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       p.value AS purchase_value,
       CAST(count(v.ts) AS BIGINT) AS views_prior
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
  ON v.user_id = p.user_id
 AND v.ts >= p.ts - INTERVAL 60 MINUTE
 AND v.ts < p.ts
GROUP BY p.event_id, p.user_id, p.ts, p.value
ORDER BY purchase_id
"""


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: collapse each user's
    event stream into versioned state rows (state = event_type here;
    the same plan builds any attribute history). A row opens when the
    state CHANGES vs the previous event and closes at the next change
    (valid_to NULL = current) — the merge pattern a lakehouse dimension
    table maintains incrementally.

    One shuffle on user_id serves both windows (change detection and
    the closing lead); the change-filter runs on lag() of a RAW column,
    so no derivation is duplicated into the filter (SCALE.md §9).
    """
    ev = io.read_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    # explicit NULLS LAST: Spark defaults ascending-nulls-FIRST while
    # DuckDB defaults nulls-LAST, so a null-state event tying on ts
    # would version differently per engine (found by the fuzz gate)
    order = [F.col("ts"), F.col("event_type").asc_nulls_last()]
    w = Window.partitionBy("user_id").orderBy(*order)
    changed = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy(*order)
    return changed.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    ).orderBy("user_id", "version")


SCD2_SQL = """
WITH marked AS (
    SELECT user_id, ts, event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_type NULLS LAST) AS prev_type
    FROM events
), changed AS (
    SELECT user_id, ts, event_type FROM marked
    WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type AS state, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type NULLS LAST) AS valid_to,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_type NULLS LAST) AS INTEGER) AS version
FROM changed
ORDER BY user_id, version
"""


def gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap filling: a dense hourly grid per event_type
    over the table's time span, zero-filling missing buckets' counts
    and carrying the last observed value forward (LOCF) for the
    gauge-style metric.

    The grid is generated from a 1-row bounds aggregate × the distinct
    type dimension (both broadcast — grid size is hours × types,
    independent of event volume); actual hourly aggregates left-join
    onto it. LOCF is one ignore-nulls window over the grid, not the
    events. At 100 TB the heavy side (hourly aggregation) stays a
    partial-aggregated shuffle; the gap-fill machinery never touches
    raw rows.
    """
    from pyspark.sql.functions import broadcast

    ev = io.read_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket_start"), "event_type"
    ).agg(
        F.count("*").alias("events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = (
        bounds.select(
            F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("bucket_start")
        )
        .crossJoin(broadcast(ev.select("event_type").distinct()))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["bucket_start", "event_type"], "left")
        .select(
            "bucket_start",
            "event_type",
            F.coalesce("events", F.lit(0)).alias("events"),
            F.round(F.last("total_value", ignorenulls=True).over(w), 6).alias("locf_value"),
        )
        .orderBy("bucket_start", "event_type")
    )


GAP_FILL_SQL = """
WITH hourly AS (
    SELECT date_trunc('hour', ts) AS bucket_start, event_type,
           count(*) AS events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
), bounds AS (
    SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
    FROM events
), grid AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_start, t.event_type
    FROM bounds, (SELECT DISTINCT event_type FROM events) t
)
SELECT g.bucket_start, g.event_type,
       CAST(coalesce(h.events, 0) AS BIGINT) AS events,
       round(last_value(h.total_value IGNORE NULLS)
             OVER (PARTITION BY g.event_type ORDER BY g.bucket_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS locf_value
FROM grid g LEFT JOIN hourly h
  ON h.bucket_start = g.bucket_start AND h.event_type = g.event_type
ORDER BY g.bucket_start, g.event_type
"""


def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via Spark 4's native VARIANT type:
    ``parse_json`` once into a binary variant, then typed
    ``variant_get`` extraction plus ``schema_of_variant`` schema
    discovery — the engine-native path for schema-on-read JSON that
    replaces per-query string re-parsing (`q_events_props` keeps the
    portable get_json_object twin).

    Why VARIANT at scale: the parse happens once per row into a
    shredded binary encoding; every downstream extraction is a typed
    byte-offset read, not a JSON re-parse — the difference between one
    and N parses when N queries touch the same props column. Also
    demonstrated: ``try_variant_get`` missing-path tolerance and
    per-type schema discovery aggregated corpus-wide. One
    partial-aggregable shuffle on event_type.
    """
    ev = io.read_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.parse_json("props").alias("v"),
    ).select(
        "event_type",
        F.variant_get("v", "$.k", "int").alias("k"),
        F.schema_of_variant("v").alias("vschema"),
        F.try_variant_get("v", "$.missing", "int").alias("absent"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.round(F.sum("k") / F.count("k"), 6).alias("avg_k"),
            F.countDistinct("vschema").cast("bigint").alias("n_schemas"),
            F.count("absent").cast("bigint").alias("n_with_missing_path"),
        )
        .orderBy("event_type")
    )


PROPS_VARIANT_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
       round(CAST(sum(CAST(props->>'$.k' AS INTEGER)) AS DOUBLE)
             / count(props->>'$.k'), 6) AS avg_k,
       CAST(count(DISTINCT json_structure(props::JSON)) AS BIGINT) AS n_schemas,
       CAST(sum(CASE WHEN json_extract(props, '$.missing') IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_with_missing_path
FROM events
GROUP BY event_type
ORDER BY event_type
"""
