"""Event-time operators over the ``events`` table.

The reference's only time semantics are year/month derivation and per-date
grouping (``preprocessing.py:356-357,630``; SURVEY §2.8). The engine keeps
those (P3/P5/A7) and adds the event-time surface a streaming pipeline needs
— tumbling windows, sessionization, as-of lookback — expressed so the SAME
logic runs in Structured Streaming (see ``streaming/``): windowed aggregates
are ``F.window``-compatible groupings, sessionization is the lag/cumsum
pattern (batch) or ``session_window`` (streaming).

Window-function determinism: every ORDER BY includes ``event_id`` as the
final tie-break so frames are total-ordered under any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

SESSION_GAP_SECONDS = 1800


@register(
    "events_date_parts",
    sql="""
SELECT event_id,
       CAST(year(ts) AS INT) AS yr,
       CAST(month(ts) AS INT) AS mon,
       strftime(ts, '%Y-%m-%d') AS day
FROM events
""",
    tags=("events", "prep"),
)
def q_events_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY P3/P5: date-part derivation (``preprocessing.py:356-357``)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.year("ts").alias("yr"),
        F.month("ts").alias("mon"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )


@register(
    "events_hourly",
    sql="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       count(*) AS cnt,
       round(sum(value), 2) AS total_value,
       round(avg(value), 6) AS avg_value
FROM events
GROUP BY 1, 2
""",
    tags=("events", "window", "flagship"),
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate (SURVEY A7 scaled up): the batch twin of
    the streaming windowed count in ``streaming/wordcount.py``. Partial
    aggregation means the shuffle carries one row per (hour, type)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


@register(
    "events_daily_users",
    sql="""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events
GROUP BY 1
""",
    tags=("events",),
)
def q_events_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users — the per-date group count of
    ``preprocessing.py:630-636`` plus a distinct aggregate."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.countDistinct("user_id").alias("n_users"), F.count("*").alias("n_events")
    )


@register(
    "sessionize_events",
    sql=f"""
WITH laggy AS (
    SELECT user_id, event_id,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > {SESSION_GAP_SECONDS} * 1000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
)
SELECT user_id,
       CAST(sum(new_session) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM laggy
GROUP BY user_id
""",
    tags=("events", "window"),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gap > 30 min ⇒ new session) via lag + flag-sum — the
    batch expression of ``session_window``. One shuffle on user_id serves
    both the window and the final aggregate (same partitioning reused)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    new_session = (
        F.when(
            (us - F.lag(us).over(w) > SESSION_GAP_SECONDS * 1_000_000)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
    )
    return (
        e.select("user_id", "event_id", new_session.alias("new_session"))
        .groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"), F.count("*").alias("n_events")
        )
    )


@register(
    "asof_last_signup",
    sql="""
SELECT event_id, user_id,
       coalesce(strftime(max(CASE WHEN event_type = 'signup' THEN ts END)
                             OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         '%Y-%m-%d %H:%M:%S'), '') AS last_signup
FROM events
""",
    tags=("events", "window", "asof"),
)
def q_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of lookback join expressed as a running conditional max — for
    same-table as-of this beats a range join: one shuffle on user_id, no
    pair blowup. (Cross-table as-of: union-tag the two streams, then this
    same window — see ``streaming`` notes.)"""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_signup = F.max(
        F.when(F.col("event_type") == "signup", F.col("ts"))
    ).over(w)
    return e.select(
        "event_id",
        "user_id",
        F.coalesce(
            F.date_format(last_signup, "yyyy-MM-dd HH:mm:ss"), F.lit("")
        ).alias("last_signup"),
    )


@register(
    "events_running_value",
    sql="""
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_value,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
FROM events
""",
    tags=("events", "window"),
)
def q_events_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic frame: per-user running sum + sequence number (SURVEY §7.2
    window fill-in). Left-to-right frame sum ⇒ identical association order
    in both engines, so values match bit-for-bit before rounding."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_value"),
        F.row_number().over(w).alias("seq"),
    )


@register(
    "event_type_share",
    sql="""
SELECT event_type,
       count(*) AS cnt,
       round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS share
FROM events
GROUP BY event_type
""",
    tags=("events", "agg"),
)
def q_event_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + global-window share (ratio-to-report)."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(F.count("*").alias("cnt"))
    return counts.select(
        "event_type",
        "cnt",
        F.round(F.col("cnt") / F.sum("cnt").over(Window.partitionBy()), 6).alias(
            "share"
        ),
    )


@register(
    "daily_count_stats",
    sql="""
WITH daily AS (
    SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
    FROM events GROUP BY 1
)
SELECT count(*) AS n_days,
       round(avg(n), 6) AS avg_daily,
       CAST(max(n) AS BIGINT) AS max_daily,
       CAST(min(n) AS BIGINT) AS min_daily
FROM daily
""",
    tags=("events", "agg"),
)
def q_daily_count_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY A7: per-date group count, then mean/max/min OF the daily
    series (``preprocessing.py:630-636``) — a two-level aggregate; level
    one shuffles to ~365 rows/year, level two is a scalar."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count("*").alias("n")
    )
    return daily.agg(
        F.count("*").alias("n_days"),
        F.round(F.avg("n"), 6).alias("avg_daily"),
        F.max("n").alias("max_daily"),
        F.min("n").alias("min_daily"),
    )


@register(
    "props_json_extract",
    sql="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INT) AS k,
       CASE WHEN CAST(json_extract(props, '$.k') AS INT) >= 50
            THEN 'high' ELSE 'low' END AS k_band
FROM events
WHERE props IS NOT NULL
""",
    tags=("events", "semistructured"),
)
def q_props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull a typed field out of the JSON
    ``props`` column (beyond-reference; every event pipeline needs it).
    ``get_json_object`` stays JVM-side; at scale prefer ``from_json`` with
    an explicit schema once the shape is known — both push the scan down
    to (event_id, props) only."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.filter(F.col("props").isNotNull())
        .select(
            "event_id",
            k.alias("k"),
            F.when(k >= 50, "high").otherwise("low").alias("k_band"),
        )
    )


@register(
    "props_variant_stats",
    sql="""
WITH x AS (
    SELECT event_type,
           TRY_CAST(floor(TRY_CAST(
               CASE WHEN json_valid(props)
                    THEN json_extract_string(props, '$.k') END
               AS DOUBLE)) AS BIGINT) AS k
    FROM events
    WHERE props IS NOT NULL
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       min(k) AS min_k,
       max(k) AS max_k,
       round(avg(k * 1.0), 6) AS mean_k
FROM x
GROUP BY event_type
""",
    tags=("events", "semistructured"),
)
def q_props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured rollup via Spark 4's VariantType: ``try_parse_json``
    once into the binary variant encoding, ``try_variant_get`` the typed
    field, aggregate per event type. Variant beats per-access
    ``get_json_object`` when several fields are pulled from one document
    (parse once, O(1) typed access each) and beats ``from_json`` when the
    schema is open — exactly the shape of crawl/event metadata at scale.

    Dirty-input posture (review finding): ``try_parse_json`` +
    ``try_variant_get`` null out malformed JSON / non-numeric k instead
    of crashing the job, and both engines extract k as DOUBLE then
    ``floor`` it — CAST-to-INT would round in DuckDB but truncate in
    Spark, so the floor is the cross-engine integer contract for
    non-integer payloads. The mean divides an exact integer sum by the
    count, so both engines round the identical double."""
    e = load_table(spark, sf_dir, "events")
    k = F.floor(
        F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "double")
    ).cast("bigint")
    return (
        e.filter(F.col("props").isNotNull())
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg(F.col("k") * F.lit(1.0)), 6).alias("mean_k"),
        )
    )


ATTRIBUTION_WINDOW_SECONDS = 1800


@register(
    "click_attribution",
    sql=f"""
SELECT c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.user_id,
       round(p.value, 2) AS purchase_value,
       (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS lag_seconds
FROM events c
JOIN events p
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase'
 AND c.event_type = 'click'
 AND p.ts > c.ts
 AND p.ts <= c.ts + INTERVAL {ATTRIBUTION_WINDOW_SECONDS} SECONDS
""",
    tags=("events", "join", "interval"),
)
def q_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: attribute each purchase to every click by the
    same user within the preceding {ATTRIBUTION_WINDOW_SECONDS}s — the batch
    twin of the streaming ``click_purchase_attribution`` pipeline. The
    equi-key (user_id) carries the shuffle; the time band is a post-probe
    filter, so this is a plain hash join, not an O(N²) theta join. At 100 TB
    both sides would be pre-bucketed by user_id, making it co-located."""
    e = load_table(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
        F.col("value"),
    )
    cond = (
        (F.col("cu") == F.col("pu"))
        & (F.col("pts") > F.col("cts"))
        & (
            F.col("pts")
            <= F.col("cts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_SECONDS} SECONDS")
        )
    )
    return c.join(p, cond).select(
        "click_id",
        "purchase_id",
        F.col("cu").alias("user_id"),
        F.round("value", 2).alias("purchase_value"),
        # µs difference then floor-divide: epoch()/unix_timestamp() disagree
        # on sub-second handling (fractional vs truncated) across engines
        F.floor(
            (F.unix_micros(F.col("pts")) - F.unix_micros(F.col("cts"))) / 1_000_000
        ).cast("long").alias("lag_seconds"),
    )


MOVING_DAYS = 7


@register(
    "moving_window_revenue",
    sql=f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day, sum(value) AS v
    FROM events GROUP BY event_type, CAST(ts AS DATE)
),
d AS (SELECT event_type, day, v, datediff('day', DATE '1970-01-01', day) AS dn FROM daily)
SELECT event_type, day,
       round(sum(v) OVER (PARTITION BY event_type ORDER BY dn
                          RANGE BETWEEN {MOVING_DAYS - 1} PRECEDING AND CURRENT ROW), 2)
           AS moving_{MOVING_DAYS}d,
       CAST(count(*) OVER (PARTITION BY event_type ORDER BY dn
                           RANGE BETWEEN {MOVING_DAYS - 1} PRECEDING AND CURRENT ROW) AS BIGINT)
           AS days_in_window
FROM d
""",
    tags=("events", "window"),
)
def q_moving_window_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per event type, the trailing
    {MOVING_DAYS}-day value sum over the DAILY series — a RANGE frame over
    event time, not a ROWS frame (gaps in the calendar shrink the window,
    which ROWS would silently paper over). The frame key is an integer day
    number, so the range arithmetic is exact on both engines. Scale shape:
    daily pre-aggregation first (the shuffle carries one row per
    (type, day)), then the window runs over the tiny series."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum("value").alias("v"))
        .withColumn("dn", F.datediff("day", F.lit("1970-01-01").cast("date")))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("dn")
        .rangeBetween(-(MOVING_DAYS - 1), 0)
    )
    return daily.select(
        "event_type",
        "day",
        F.round(F.sum("v").over(w), 2).alias(f"moving_{MOVING_DAYS}d"),
        F.count("*").over(w).alias("days_in_window"),
    )


@register(
    "funnel_conversion",
    sql="""
WITH v AS (
    SELECT user_id, min(ts) AS t FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t
    WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_view_click,
       (SELECT count(*) FROM p) AS n_full_funnel
""",
    tags=("events", "funnel"),
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): a user advances a stage
    only with a strictly LATER event — the sequence-matching shape product
    analytics runs constantly, expressed as two stage-joins on per-user
    stage times (each stage table is one row per user, so the joins are
    cheap and co-partitioned on user_id at any scale)."""
    e = load_table(spark, sf_dir, "events")

    def stage(event_type: str, after: DataFrame | None) -> DataFrame:
        s = e.filter(F.col("event_type") == event_type)
        if after is not None:
            prev = after.select("user_id", F.col("t").alias("prev_t"))
            s = s.join(prev, "user_id").filter(F.col("ts") > F.col("prev_t"))
        return s.groupBy("user_id").agg(F.min("ts").alias("t"))

    v = stage("view", None)
    c = stage("click", v)
    p = stage("purchase", c)
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_full_funnel")))
    )


EWMA_ALPHA_W = 0.5  # decay weight (1 - alpha); 0.5 is exact in binary


@register(
    "ewma_daily_events",
    sql=f"""
WITH daily AS (
    SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events
    FROM events GROUP BY 1
),
idx AS (
    SELECT day, n_events,
           row_number() OVER (ORDER BY day) AS i
    FROM daily
)
SELECT a.day, a.n_events,
       round(sum(b.n_events * power({EWMA_ALPHA_W}, a.i - b.i))
             / sum(power({EWMA_ALPHA_W}, a.i - b.i)), 6) AS ewma
FROM idx a JOIN idx b ON b.i <= a.i
GROUP BY a.day, a.n_events
""",
    tags=("events", "timeseries"),
)
def q_ewma_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of the daily event count —
    the smoothing step of the reference's per-date trend analysis
    (``preprocessing.py:630-636``'s daily series), in the adjusted form
    e_t = sum_i w^(t-i) x_i / sum_i w^(t-i) with w = {EWMA_ALPHA_W}
    (pandas ``ewm(adjust=True)`` semantics — no special-cased first
    term). w = 0.5 is a power of two, so every weight is exact in binary
    and DuckDB replays the series bit-for-bit after the 6-dp round.

    Scale shape: the corpus-sized work is the daily pre-aggregation (one
    map-side-combined shuffle); the smoothing then runs on the DATE GRAIN
    — a series bounded by the calendar (365 rows/year), not the corpus —
    so the O(n^2) prefix join and the single-partition row_number are
    over a constant-sized frame at any data volume."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count("*").alias("n_events")
    )
    idx = daily.select(
        "day", "n_events", F.row_number().over(Window.orderBy("day")).alias("i")
    )
    a = idx.select(
        F.col("day"), F.col("n_events"), F.col("i").alias("ia")
    )
    b = idx.select(F.col("n_events").alias("xb"), F.col("i").alias("ib"))
    wgt = F.pow(F.lit(EWMA_ALPHA_W), F.col("ia") - F.col("ib"))
    return (
        a.join(b, F.col("ib") <= F.col("ia"))
        .groupBy("day", "n_events")
        .agg(
            F.round(F.sum(F.col("xb") * wgt) / F.sum(wgt), 6).alias("ewma")
        )
    )


@register(
    "cohort_retention",
    sql="""
WITH firstw AS (
    SELECT user_id, min(date_trunc('week', ts)) AS cohort
    FROM events GROUP BY user_id
),
act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', f.cohort, a.wk) // 7 AS BIGINT) AS week_offset,
       count(DISTINCT a.user_id) AS n_users
FROM act a JOIN firstw f USING (user_id)
GROUP BY 1, 2
""",
    tags=("events", "analytics"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the classic activation analysis over the A7
    per-date machinery: users grouped by first-activity week (cohort),
    counted per subsequent activity week offset. Two aggregations, both
    map-side-combined on user_id / (cohort, offset); the cohort table is
    user-sized and joins co-partitioned on user_id."""
    e = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    firstw = e.groupBy("user_id").agg(F.min(wk).alias("cohort"))
    act = e.select("user_id", wk.alias("wk")).distinct()
    return (
        act.join(firstw, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("wk"), F.col("cohort")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "event_transition_matrix",
    sql="""
WITH seq AS (
    SELECT user_id, event_type,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
    FROM events
),
c AS (
    SELECT event_type AS cur, nxt, count(*) AS n
    FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
)
SELECT cur, nxt, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY cur), 6) AS p
FROM c
""",
    tags=("events", "analytics"),
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event sequences —
    P(next event type | current), the behavioral-model complement of the
    funnel/sessionization family. One lead window partitioned on user_id
    (the same shuffle sessionization uses), then a K x K aggregate
    (event-type vocabulary — tiny at any scale)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    c = seq.groupBy(
        F.col("event_type").alias("cur"), "nxt"
    ).agg(F.count("*").alias("n"))
    wc = Window.partitionBy("cur")
    return c.select(
        "cur", "nxt", "n", F.round(F.col("n") / F.sum("n").over(wc), 6).alias("p")
    )


@register(
    "scd2_user_status",
    sql="""
WITH seq AS (
    SELECT user_id, event_type, ts, event_id,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events
),
starts AS (
    SELECT user_id, event_type, ts AS valid_from, event_id,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
    FROM seq WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type AS status, valid_from, valid_to,
       (valid_to IS NULL) AS is_current
FROM starts
""",
    tags=("events", "analytics", "scd"),
)
def q_scd2_user_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an event stream: each
    run of consecutive identical event types per user becomes one
    validity interval [valid_from, valid_to), open-ended for the current
    state — the standard warehouse history-table shape, derived with two
    windows over the same user_id partitioning (one shuffle total)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return seq.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


ANOMALY_Z = 1.5  # |z| >= this flags a day as anomalous


@register(
    "daily_anomalies",
    sql=f"""
WITH daily AS (
    SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events
    FROM events GROUP BY 1
),
stats AS (
    SELECT avg(n_events) AS mu, stddev_samp(n_events) AS sigma FROM daily
)
SELECT d.day, d.n_events,
       round((d.n_events - s.mu) / s.sigma, 6) AS z,
       (abs((d.n_events - s.mu) / s.sigma) >= {ANOMALY_Z}) AS is_anomaly
FROM daily d CROSS JOIN stats s
""",
    tags=("events", "timeseries", "analytics"),
)
def q_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly flags over the daily event series — the alerting
    step on top of A7's per-date counts (pairs with ``ewma_daily_events``
    for the monitoring story). The corpus-sized work is the daily
    pre-aggregation; mu/sigma are one global aggregate broadcast back
    onto the calendar-bounded series."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count("*").alias("n_events")
    )
    stats = daily.agg(
        F.avg("n_events").alias("mu"), F.stddev_samp("n_events").alias("sigma")
    )
    z = (F.col("n_events") - F.col("mu")) / F.col("sigma")
    return daily.crossJoin(F.broadcast(stats)).select(
        "day",
        "n_events",
        F.round(z, 6).alias("z"),
        (F.abs(z) >= ANOMALY_Z).alias("is_anomaly"),
    )


SEQ3_TOP_K = 15


@register(
    "event_trigram_sequences",
    sql=f"""
WITH seq AS (
    SELECT user_id, event_type AS e1,
           lead(event_type, 1) OVER w AS e2,
           lead(event_type, 2) OVER w AS e3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1, e2, e3, count(*) AS n,
       row_number() OVER (ORDER BY count(*) DESC, e1, e2, e3) AS rank
FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
GROUP BY e1, e2, e3
QUALIFY rank <= {SEQ3_TOP_K}
""",
    tags=("events", "analytics", "sequence"),
)
def q_event_trigram_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent length-3 behavior sequences — the sequential-pattern
    complement of the first-order transition matrix (PrefixSpan's
    contiguous-trigram slice, kept exact-oracle where the MLlib miner
    would be rows-only). One lead window on the shared user_id
    sessionization shuffle, then a K^3-bounded aggregate."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    wr = Window.orderBy(F.desc("n"), F.asc("e1"), F.asc("e2"), F.asc("e3"))
    return (
        seq.groupBy("e1", "e2", "e3")
        .agg(F.count("*").alias("n"))
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= SEQ3_TOP_K)
    )


K_ANON = 25  # groups smaller than this are re-identification risks


@register(
    "k_anonymity_report",
    sql=f"""
WITH g AS (
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
           count(DISTINCT user_id) AS group_size
    FROM events
    GROUP BY 1, 2
)
SELECT count(*) AS n_groups,
       CAST(min(group_size) AS BIGINT) AS min_group,
       CAST(sum(CASE WHEN group_size < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_below_k,
       round(avg(group_size), 6) AS avg_group
FROM g
""",
    tags=("events", "privacy", "governance"),
)
def q_k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity audit over the (event_type, day) quasi-identifier
    pair — the release-gate check paired with ``pii_redact``: how many
    quasi-identifier groups exist, the smallest group, and how many fall
    below k={K_ANON} (those rows re-identify). One map-side-combined
    aggregate over the grain; the report is grain-bounded."""
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.countDistinct("user_id").alias("group_size"))
    return g.agg(
        F.count("*").alias("n_groups"),
        F.min("group_size").alias("min_group"),
        F.sum(F.when(F.col("group_size") < K_ANON, 1).otherwise(0)).alias(
            "n_below_k"
        ),
        F.round(F.avg("group_size"), 6).alias("avg_group"),
    )
