"""Driver-checkable CDC upsert-planning queries (SURVEY.md §2.2 P9,
§2.3 J9, §2.7 ST1/ST2).

Desired/state pairs are constructed deterministically from `customer`
on BOTH sides: state holds even keys, with stale titles for keys
divisible by 6 and stale field values for keys divisible by 10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trello_github_etl_spark.io import load_table
from trello_github_etl_spark.plans.upserts import plan_upserts
from trello_github_etl_spark.registry import query


def _desired(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        F.col("c_custkey").cast("string").alias("entity_id"),
        F.col("c_name").alias("title"),
        F.when(F.col("c_acctbal") < 0, F.lit("closed"))
        .otherwise(F.lit("open"))
        .alias("state"),
        F.create_map(
            F.lit("Segment"), F.col("c_mktsegment"),
            F.lit("Nation"), F.col("c_nationkey").cast("string"),
        ).alias("field_values"),
    )


def _state(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 2 == 0)
    stale_title = F.when(
        F.col("c_custkey") % 6 == 0, F.concat(F.col("c_name"), F.lit(" OLD"))
    ).otherwise(F.col("c_name"))
    stale_seg = F.when(F.col("c_custkey") % 10 == 0, F.lit("STALE")).otherwise(
        F.col("c_mktsegment")
    )
    return cust.select(
        F.lit("card").alias("entity_kind"),
        F.col("c_custkey").cast("string").alias("entity_id"),
        F.col("c_custkey").alias("issue_number"),
        stale_title.alias("title"),
        F.when(F.col("c_acctbal") < 0, F.lit("closed"))
        .otherwise(F.lit("open"))
        .alias("state"),
        F.lit(0).cast("long").alias("migration"),
        # Nation never cached → always a field_change for it
        F.create_map(F.lit("Segment"), stale_seg).alias("field_values"),
    )


@query(
    "cdc_creates",
    oracle="""
    SELECT CAST(c_custkey AS VARCHAR) AS entity_id, c_name AS title
    FROM customer
    WHERE c_custkey % 2 = 1
    """,
)
def cdc_creates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 anti join: desired entities with no state record."""
    plan = plan_upserts(_desired(spark, sf_dir), _state(spark, sf_dir))
    return plan.creates.select("entity_id", "title")


@query(
    "cdc_updates",
    oracle="""
    SELECT
      CAST(c_custkey AS VARCHAR) AS entity_id,
      c_name AS title,
      TRUE AS title_changed,
      FALSE AS state_changed
    FROM customer
    WHERE c_custkey % 6 = 0
    """,
)
def cdc_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 changed-only predicate: title drift + close-state sync."""
    plan = plan_upserts(_desired(spark, sf_dir), _state(spark, sf_dir))
    return plan.updates.select(
        "entity_id", "title", "title_changed", "state_changed"
    )


@query(
    "cdc_field_changes",
    oracle="""
    SELECT CAST(c_custkey AS VARCHAR) AS entity_id,
           'Segment' AS field_name,
           c_mktsegment AS new_value,
           'STALE' AS old_value
    FROM customer WHERE c_custkey % 10 = 0 AND c_custkey % 2 = 0
    UNION ALL
    SELECT CAST(c_custkey AS VARCHAR), 'Nation',
           CAST(c_nationkey AS VARCHAR), NULL
    FROM customer WHERE c_custkey % 2 = 0
    """,
)
def cdc_field_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-field CDC: changed cached values + never-written fields."""
    plan = plan_upserts(_desired(spark, sf_dir), _state(spark, sf_dir))
    return plan.field_changes


@query(
    "cdc_state_merge",
    oracle="""
    WITH state AS (
      SELECT CAST(c_custkey AS VARCHAR) AS entity_id,
             CASE WHEN c_custkey % 6 = 0 THEN c_name || ' OLD' ELSE c_name END AS title
      FROM customer WHERE c_custkey % 2 = 0
    ),
    applied AS (
      SELECT CAST(c_custkey AS VARCHAR) AS entity_id, c_name AS title
      FROM customer WHERE c_custkey % 6 = 0
    )
    SELECT s.entity_id, s.title FROM state s
    WHERE NOT EXISTS (SELECT 1 FROM applied a WHERE a.entity_id = s.entity_id)
    UNION ALL
    SELECT entity_id, title FROM applied
    """,
)
def cdc_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2 MERGE semantics: applied rows replace, others pass through."""
    from trello_github_etl_spark.plans.upserts import merge_state

    cust = load_table(spark, sf_dir, "customer")
    state = cust.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").cast("string").alias("entity_id"),
        F.when(F.col("c_custkey") % 6 == 0, F.concat(F.col("c_name"), F.lit(" OLD")))
        .otherwise(F.col("c_name"))
        .alias("title"),
    )
    applied = cust.filter(F.col("c_custkey") % 6 == 0).select(
        F.col("c_custkey").cast("string").alias("entity_id"),
        F.col("c_name").alias("title"),
    )
    return merge_state(state, applied)


@query(
    "cdc_scd2_history",
    oracle="""
    WITH history AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS entity_id,
             o_orderstatus AS value,
             o_orderdate AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM orders WHERE o_orderkey % 97 = 0
    ),
    changes AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS entity_id,
             'X' AS value,
             o_orderdate + INTERVAL 30 DAY AS ts
      FROM orders WHERE o_orderkey % 194 = 0
      UNION ALL
      SELECT CAST(o_orderkey AS VARCHAR), o_orderpriority,
             o_orderdate + INTERVAL 30 DAY
      FROM orders WHERE o_orderkey % 9700 = 50
    ),
    open_rows AS (SELECT * FROM history WHERE valid_to IS NULL),
    closed_rows AS (SELECT * FROM history WHERE valid_to IS NOT NULL),
    effective AS (
      SELECT c.entity_id, c.value, c.ts
      FROM changes c LEFT JOIN open_rows o ON o.entity_id = c.entity_id
      WHERE o.value IS NULL OR c.value <> o.value
    )
    SELECT entity_id, value, valid_from, valid_to FROM closed_rows
    UNION ALL
    SELECT o.entity_id, o.value, o.valid_from, CAST(NULL AS TIMESTAMP)
    FROM open_rows o
    WHERE NOT EXISTS (SELECT 1 FROM effective e WHERE e.entity_id = o.entity_id)
    UNION ALL
    SELECT o.entity_id, o.value, o.valid_from, e.ts
    FROM open_rows o JOIN effective e ON e.entity_id = o.entity_id
    UNION ALL
    SELECT entity_id, value, ts, CAST(NULL AS TIMESTAMP) FROM effective
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 versioned history apply on a deterministic synthetic
    history/changes pair: %194 keys flip status (close + reopen),
    %9700+50 keys are brand-new entities, the rest pass untouched."""
    from trello_github_etl_spark.plans.upserts import apply_scd2

    orders = load_table(spark, sf_dir, "orders")
    history = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").cast("string").alias("entity_id"),
        F.col("o_orderstatus").alias("value"),
        F.col("o_orderdate").alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
    )
    changes = (
        orders.filter(F.col("o_orderkey") % 194 == 0)
        .select(
            F.col("o_orderkey").cast("string").alias("entity_id"),
            F.lit("X").alias("value"),
            F.expr("o_orderdate + INTERVAL 30 DAYS").alias("ts"),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 9700 == 50).select(
                F.col("o_orderkey").cast("string").alias("entity_id"),
                F.col("o_orderpriority").alias("value"),
                F.expr("o_orderdate + INTERVAL 30 DAYS").alias("ts"),
            )
        )
    )
    return apply_scd2(history, changes)
