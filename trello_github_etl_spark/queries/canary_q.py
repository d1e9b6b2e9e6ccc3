"""Output-type-family canaries (VERDICT r13 #7).

The r12 t19 driver red taught that a cross-environment
canonicalization drift (how a fetch layer renders a typed value)
looks like a bare hash mismatch with zero localization. t19d's
per-column-fingerprint pattern fixed that for its integer columns;
these three extend the pattern to the remaining typed output
families the registry permits — DATE, TIMESTAMP, BOOLEAN.

Each canary emits, in ONE row: the typed values themselves (min/max
— the surface the driver's canonicalizer renders) AND an md5
fingerprint of the engine-side stringification of the full sorted
value list. If a driver red ever hits one of these, the failing
column names the family: typed column red + fp green ⇒ the driver's
rendering of that TYPE drifted; both red ⇒ real value divergence.

They are DRIVER_SAMPLE_ANCHORS — present in every round's window —
and deliberately cheap: one scan of a single table, one 1-row
aggregate. Like t19d, the collect_list pulls one scalar array into a
single reduce task; this is gate instrumentation, bounded by
distinct-value counts (months / distinct shipdates / orders), never
a bench headline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from trello_github_etl_spark.io import load_table
from trello_github_etl_spark.registry import query


def _fp(col: Column) -> Column:
    """md5 of the sorted, stringified value list — t19d's fingerprint
    shape: sort TYPED (so both engines order identically), then cast
    each element to string, then comma-join."""
    return F.md5(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list(col)),
                lambda v: v.cast("string"),
            ),
        )
    )


@query(
    "canary_date_fps",
    oracle="""
    WITH months AS (
      SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE)
        AS month
      FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           min(month) AS min_month,
           max(month) AS max_month,
           md5(array_to_string(list_sort(list(month)), ',')) AS fp_month
    FROM months
    """,
)
def canary_date_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE-family canary: distinct order months as typed DATEs plus
    their stringified fingerprint ('1995-03-01' on both engines)."""
    months = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .alias("month")
        )
        .distinct()
    )
    return months.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("month").alias("min_month"),
        F.max("month").alias("max_month"),
        _fp(F.col("month")).alias("fp_month"),
    )


@query(
    "canary_timestamp_fps",
    oracle="""
    WITH ts AS (SELECT DISTINCT l_shipdate AS ship_ts FROM lineitem)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           min(ship_ts) AS min_ts,
           max(ship_ts) AS max_ts,
           md5(array_to_string(list_sort(list(ship_ts)), ',')) AS fp_ts
    FROM ts
    """,
)
def canary_timestamp_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMP-family canary: distinct ship timestamps, typed plus
    fingerprinted ('1995-01-02 00:00:00' rendering on both engines)."""
    ts = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_shipdate").alias("ship_ts"))
        .distinct()
    )
    return ts.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("ship_ts").alias("min_ts"),
        F.max("ship_ts").alias("max_ts"),
        _fp(F.col("ship_ts")).alias("fp_ts"),
    )


@query(
    "canary_boolean_fps",
    oracle="""
    WITH flags AS (
      SELECT o_orderkey, o_totalprice > 150000.0 AS is_big FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN is_big THEN 1 ELSE 0 END) AS BIGINT)
             AS n_big,
           bool_or(is_big) AS any_big,
           bool_and(is_big) AS all_big,
           md5(array_to_string(list_sort(list(
             CAST(o_orderkey AS VARCHAR) || ':' ||
             CAST(is_big AS VARCHAR)
           )), ',')) AS fp_flags
    FROM flags
    """,
)
def canary_boolean_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOOLEAN-family canary: a per-order flag with typed BOOLEAN
    aggregates (bool_or/bool_and) plus a 'key:true/false' fingerprint
    — the threshold is a double literal compared identically on both
    engines."""
    flags = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice") > F.lit(150000.0)).alias("is_big"),
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("is_big"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_big"),
        F.bool_or("is_big").alias("any_big"),
        F.bool_and("is_big").alias("all_big"),
        _fp(
            F.concat_ws(
                ":",
                F.col("o_orderkey").cast("string"),
                F.col("is_big").cast("string"),
            )
        ).alias("fp_flags"),
    )
