"""Windowed-aggregation queries on `events` with DuckDB oracles.

Spark's `window()` is epoch-aligned, so hour/30-min buckets equal
DuckDB `time_bucket`. Session windows oracle via gaps-and-islands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trello_github_etl_spark.io import load_table
from trello_github_etl_spark.registry import query
from trello_github_etl_spark.streaming.windows import (
    session_windows,
    sliding_counts,
    tumbling_counts,
)


@query(
    "w1_tumbling_counts",
    oracle="""
    SELECT
      time_bucket(INTERVAL '1 hour', ts) AS window_start,
      event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def w1_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_table(spark, sf_dir, "events"))


@query(
    "w2_sliding_counts",
    oracle="""
    WITH cand AS (
      SELECT
        time_bucket(INTERVAL '30 minutes', ts)
          - (o.off * INTERVAL '30 minutes') AS window_start
      FROM events, (VALUES (0), (1)) AS o(off)
    )
    SELECT window_start, COUNT(*) AS n
    FROM cand
    GROUP BY window_start
    """,
)
def w2_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(load_table(spark, sf_dir, "events"))


@query(
    "w3_session_windows",
    oracle="""
    WITH ordered AS (
      SELECT
        user_id, ts, value,
        CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL '5 minutes'
             OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    tagged AS (
      SELECT *, SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS session_id
      FROM ordered
    )
    SELECT
      MIN(ts) AS session_start,
      MAX(ts) + INTERVAL '5 minutes' AS session_end,
      user_id,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM tagged
    GROUP BY user_id, session_id
    """,
)
def w3_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window end = last event + gap, matching the oracle."""
    return session_windows(load_table(spark, sf_dir, "events"))


@query(
    "w4_user_event_sequences",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
           SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )::DOUBLE AS running_value,
           ROW_NUMBER() OVER w AS seq
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w4_user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered sequences: lag gaps (exact µs), running
    decimal-exact value total, and sequence numbers — one shuffle on
    user_id shared by all three window functions."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(wr)
        .cast("double")
        .alias("running_value"),
        F.row_number().over(w).alias("seq"),
    )


@query(
    "w5_rolling_7day_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
           )::DOUBLE AS revenue_7d
    FROM orders
    """,
)
def w5_rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-customer rolling 7-day revenue, ordered
    by exact integer microseconds so the frame bounds are engine-
    independent (no interval/timezone arithmetic in the frame)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        # parquet stores TIMESTAMP_NTZ; the session is UTC-pinned so
        # the cast to TIMESTAMP is the identity epoch mapping
        .orderBy(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-604_800_000_000, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("revenue_7d"),
    )


@query(
    "w6_rank_functions",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
      ROW_NUMBER() OVER w AS rn,
      RANK() OVER w AS rnk,
      DENSE_RANK() OVER w AS drnk,
      NTILE(4) OVER w AS quartile,
      PERCENT_RANK() OVER w AS prk,
      CUME_DIST() OVER w AS cd,
      LAG(o_orderkey, 1) OVER w AS prev_key,
      LEAD(o_orderkey, 1) OVER w AS next_key
    FROM orders
    WINDOW w AS (
      PARTITION BY o_orderpriority
      ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def w6_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function surface over one totally-ordered
    window (unique o_orderkey tie-break ⇒ engine-independent).
    percent_rank/cume_dist divide exact integers, so even the doubles
    hash-match. One window ⇒ one shuffle + one sort; all eight
    functions evaluate in a single pass over each partition."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prk"),
        F.cume_dist().over(w).alias("cd"),
        F.lag("o_orderkey", 1).over(w).alias("prev_key"),
        F.lead("o_orderkey", 1).over(w).alias("next_key"),
    )


@query(
    "w7_gapfilled_daily_counts",
    oracle="""
    WITH span AS (
      SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
      FROM events
    ),
    users AS (SELECT DISTINCT user_id FROM events),
    grid AS (
      SELECT u.user_id,
             CAST(unnest(generate_series(CAST(s.d0 AS TIMESTAMP),
                                         CAST(s.d1 AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM users u, span s
    ),
    daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT g.user_id, g.day, COALESCE(d.n, 0) AS n_events
    FROM grid g LEFT JOIN daily d
      ON d.user_id = g.user_id AND d.day = g.day
    """,
)
def w7_gapfilled_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket gap-filling (the hypertable/resampling primitive):
    a dense user × day grid over the observed span, zero-filled where
    no events landed. The span is a 1-row broadcast (never a driver
    collect), the grid is sequence+explode — users × days rows, built
    without reading the fact table twice per cell — and the fill is
    one left join keyed (user, day), uniform, skew-free."""

    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    daily = ev.groupBy("user_id", day.alias("day")).agg(
        F.count("*").alias("n")
    )
    span = ev.agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    users = ev.select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(span)).select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    return grid.join(daily, ["user_id", "day"], "left").select(
        "user_id", "day", F.coalesce("n", F.lit(0)).alias("n_events")
    )


@query(
    "ev1_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT v.user_id, MIN(e.ts) AS t_click
      FROM v JOIN events e
        ON e.user_id = v.user_id AND e.event_type = 'click'
       AND e.ts > v.t_view
      GROUP BY v.user_id
    ),
    p AS (
      SELECT c.user_id, MIN(e.ts) AS t_purchase
      FROM c JOIN events e
        ON e.user_id = c.user_id AND e.event_type = 'purchase'
       AND e.ts > c.t_click
      GROUP BY c.user_id
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def ev1_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → later click → later purchase) per user:
    each stage is one aggregate keyed on user_id, chained with the
    prior stage's timestamp as a join-time residual — three shuffles
    all sharing the user_id key, so at scale AQE chains them with no
    re-partitioning. NULL stage timestamps mark funnel drop-off."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return v.join(c, "user_id", "left").join(p, "user_id", "left").select(
        "user_id", "t_view", "t_click", "t_purchase"
    )


COHORT_EPOCH = "2024-01-01"


@query(
    "ev2_weekly_cohort_retention",
    oracle=f"""
    WITH firstseen AS (
      SELECT user_id,
             date_diff('day', DATE '{COHORT_EPOCH}',
                       MIN(CAST(ts AS DATE))) // 7 AS cohort_w
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '{COHORT_EPOCH}',
                       CAST(ts AS DATE)) // 7 AS week_w
      FROM events
    )
    SELECT f.cohort_w, a.week_w - f.cohort_w AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM firstseen f JOIN active a ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def ev2_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention grid: users bucketed by first-seen week, then
    distinct-counted per (cohort, week offset). Week indices are
    integer day-diffs from a fixed epoch (engine week-start rules
    never enter). Two user-keyed aggregates + one join + one
    distinct-agg — all shuffles on user_id or the tiny grid key."""
    ev = load_table(spark, sf_dir, "events")
    week = (
        F.datediff(F.to_date("ts"), F.lit(COHORT_EPOCH).cast("date"))
        / 7
    ).cast("long")
    firstseen = (
        ev.select("user_id", week.alias("week_w"))
        .groupBy("user_id")
        .agg(F.min("week_w").alias("cohort_w"))
    )
    active = ev.select("user_id", week.alias("week_w")).distinct()
    return (
        active.join(firstseen, "user_id")
        .groupBy(
            "cohort_w",
            (F.col("week_w") - F.col("cohort_w")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "w9_cumulative_distinct_users",
    oracle="""
    WITH firsts AS (
      SELECT event_type, user_id,
             CAST(date_trunc('day', MIN(ts)) AS DATE) AS first_day
      FROM events GROUP BY event_type, user_id
    ),
    daily AS (
      SELECT event_type, first_day AS day, COUNT(*) AS new_users
      FROM firsts GROUP BY event_type, first_day
    )
    SELECT event_type, day, new_users,
           CAST(SUM(new_users) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_distinct_users
    FROM daily
    ORDER BY event_type, day
    """,
)
def w9_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over time — the growth-curve staple —
    WITHOUT a distinct-inside-window (which Spark rejects and which
    would hold per-frame sets at scale). Rewrite: distinct collapses
    to each user's FIRST day (one hash agg on (type, user)), then a
    daily count and a running SUM over the tiny per-day series. The
    expensive shuffle is the first agg — linear in distinct pairs;
    the window runs over |days| rows per type."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("event_type", "user_id").agg(
        F.min("ts").alias("first_ts")
    )
    daily = firsts.select(
        "event_type",
        F.date_trunc("day", F.col("first_ts")).cast("date").alias("day"),
    ).groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("new_users"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "event_type", "day", "new_users",
        F.sum("new_users").over(w).alias("cum_distinct_users"),
    ).orderBy("event_type", "day")


@query(
    "ev3_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    pairs AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ),
    tot AS (
      SELECT from_type, SUM(n) AS n_from FROM pairs GROUP BY from_type
    )
    SELECT p.from_type, p.to_type, p.n,
           CAST(p.n AS DOUBLE) / t.n_from AS p_transition
    FROM pairs p JOIN tot t ON t.from_type = p.from_type
    """,
)
def ev3_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (the user-path / Sankey staple):
    per-user ordered LEAD pairs, counted globally, with row-normalized
    transition probabilities. One shuffle on user_id for the sequence
    window, one hash agg on the (from,to) pair — the per-from totals
    re-aggregate the TINY pair matrix (|types|² rows), never the
    event stream, and the single division is the only IEEE op."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return pairs.join(tot, "from_type").select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.col("n_from")).alias("p_transition"),
    )


@query(
    "w10_ohlc_buckets",
    oracle="""
    WITH r AS (
      SELECT event_type,
             date_trunc('hour', ts) AS bucket,
             CAST(value AS DECIMAL(18,2)) AS v,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, date_trunc('hour', ts)
               ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, bucket,
           CAST(MAX(CASE WHEN rn_a = 1 THEN v END) AS DOUBLE) AS open,
           CAST(MAX(v) AS DOUBLE) AS high,
           CAST(MIN(v) AS DOUBLE) AS low,
           CAST(MAX(CASE WHEN rn_d = 1 THEN v END) AS DOUBLE) AS close,
           COUNT(*) AS n_events,
           CAST(SUM(v) AS DOUBLE) AS volume
    FROM r GROUP BY event_type, bucket
    """,
)
def w10_ohlc_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick aggregation per event type and hour — the
    time-series downsampling staple (open/close = first/last by the
    unique (ts, event_id) order, high/low/volume as plain aggregates).
    One shuffle on the (type, bucket) key carries both the ordering
    windows and the final aggregation; values stay decimal(18,2)
    until the output casts, so both engines agree bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts"))
    v = F.col("value").cast("decimal(18,2)")
    wa = Window.partitionBy("event_type", bucket).orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", bucket).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = ev.select(
        "event_type",
        bucket.alias("bucket"),
        v.alias("v"),
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return r.groupBy("event_type", "bucket").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("v"))).cast("double").alias("open"),
        F.max("v").cast("double").alias("high"),
        F.min("v").cast("double").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("v"))).cast("double").alias("close"),
        F.count("*").alias("n_events"),
        F.sum("v").cast("double").alias("volume"),
    )
