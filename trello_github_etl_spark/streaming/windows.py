"""Event-time windowing (SURVEY.md §2.7 — beyond-reference surface).

The same windowed aggregations run in batch (driver-checkable against
DuckDB gaps-and-islands SQL) and in Structured Streaming
(`stream_tumbling_counts` adds a watermark; tested via file source +
memory sink). One logical definition, two execution modes — the
Spark-native streaming story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trello_github_etl_spark.queries.helpers import dsum


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling event-time window per event_type; sum_value rides
    along when the input carries a value column (count-only sources
    still work — the streaming variant reuses this definition)."""
    w = F.window("ts", width)
    has_value = "value" in events.columns
    aggs = [F.count("*").alias("n")]
    outs = [F.col("w.start").alias("window_start"), "event_type", "n"]
    if has_value:
        aggs.append(dsum("value").alias("sum_value"))
        outs.append("sum_value")
    return events.groupBy(w.alias("w"), F.col("event_type")).agg(*aggs).select(*outs)


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding window: each event lands in width/slide windows."""
    w = F.window("ts", width, slide)
    return events.groupBy(w.alias("w")).agg(
        F.count("*").alias("n"),
    ).select(F.col("w.start").alias("window_start"), "n")


def session_windows(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Per-user session windows with a fixed inactivity gap."""
    w = F.session_window("ts", gap)
    return events.groupBy(w.alias("w"), F.col("user_id")).agg(
        F.count("*").alias("n_events"),
        dsum("value").alias("sum_value"),
    ).select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "user_id",
        "n_events",
        "sum_value",
    )


def stream_tumbling_counts(
    stream: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming variant: watermarked tumbling counts (late data beyond
    the watermark is dropped; state is bounded). ONE logical
    definition: the watermark composes in front of the batch
    aggregation, so batch-vs-stream parity covers BOTH measures —
    the previous re-implementation had already dropped sum_value
    (r4 code review)."""
    return tumbling_counts(stream.withWatermark("ts", watermark), width)


def stream_click_attribution(
    clicks: DataFrame, views: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join: attribute each click to same-user
    views at most ``horizon`` before it.

    Both sides carry watermarks so Spark can bound the join state:
    view state is droppable once no future click can reach back to it
    (the time-range predicate gives the planner the eviction bound).
    """
    v = views.withWatermark("ts", horizon).select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = clicks.withWatermark("ts", horizon).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return c.join(
        v,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {horizon}")),
    ).select("click_id", "view_id", "c_user", "click_ts", "view_ts")
