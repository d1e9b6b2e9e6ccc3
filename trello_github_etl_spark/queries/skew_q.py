"""Skew-mitigation queries: the salted plans must produce results
bit-identical to the plain single-phase SQL the oracle runs — that IS
the point (salting changes the physical shape, never the answer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trello_github_etl_spark.io import load_table
from trello_github_etl_spark.operators import skew
from trello_github_etl_spark.registry import query


@query(
    "skew1_salted_event_rollup",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def skew1_salted_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-value key → every reducer hot. Two-phase salted agg: phase 1
    shuffles on (event_type, xxhash64(event_id)%32), phase 2 folds the
    32 exact-decimal partials per key."""
    ev = load_table(spark, sf_dir, "events")
    return skew.salted_count_sum(
        ev, key="event_type", value_col="value", unique_col="event_id"
    )


@query(
    "skew2_salted_join_rollup",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT event_type, upper(event_type) AS type_label
      FROM events
    )
    SELECT d.type_label, COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e JOIN dim d ON d.event_type = e.event_type
    GROUP BY d.type_label
    """,
)
def skew2_salted_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join on the skewed key: dim replicated 32×,
    fact salted, then rolled up. (At this dim size broadcast wins —
    the query exists to pin the salted plan's exactness.)"""
    ev = load_table(spark, sf_dir, "events")
    dim = ev.select("event_type").distinct().withColumn(
        "type_label", F.upper("event_type")
    )
    joined = skew.salted_join(
        ev, dim, key="event_type", fact_unique_col="event_id"
    )
    return joined.groupBy("type_label").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(skew.DEC)).cast("double").alias("sum_value"),
    )
