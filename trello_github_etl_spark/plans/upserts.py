"""Idempotent upsert planning as pure DataFrame CDC (SURVEY.md §2.7).

The reference interleaves per-entity state reads with network writes
(etl.js:24–169, 171–331): "already created?" guards (J9), changed-only
field writes (P9), title-drift and close-state sync, all tracked in a
local KV store (`db.json`, S5/S6) with per-phase migration gates
(ST1: M_CREATED=0 → M_LISTS=1).

Here planning is separated from execution: `plan_upserts` compares the
desired state against the state table and emits three DataFrames —
`creates` (anti join), `updates` (semi join + drift predicates), and
`field_changes` (per-field CDC) — which a sink executes and a MERGE
persists. Everything is keyed equi-join work that shuffles once on
`entity_id`; no driver loops.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

M_CREATED = 0  # etl.js:3
M_LISTS = 1  # etl.js:4

# Replica of the db.json record shape (FIXTURES.md §A issue_state).
STATE_SCHEMA = StructType(
    [
        StructField("entity_kind", StringType()),  # card | checkItem
        StructField("entity_id", StringType()),
        StructField("issue_number", LongType()),
        StructField("title", StringType()),
        StructField("body", StringType()),
        StructField("state", StringType()),  # open | closed
        StructField("migration", LongType()),
        StructField("field_values", MapType(StringType(), StringType())),
    ]
)


@dataclass
class UpsertPlan:
    creates: DataFrame
    updates: DataFrame
    field_changes: DataFrame


def plan_upserts(
    desired: DataFrame,
    state: DataFrame,
    key: str = "entity_id",
) -> UpsertPlan:
    """Compute the create/update/field-change sets.

    ``desired`` columns: entity_id, title, state, and a
    ``field_values`` map of custom-field name → desired value.
    ``state``: STATE_SCHEMA.

    - creates: desired rows with no state record (J9 anti join,
      etl.js:42–46, 194–199);
    - updates: existing rows whose title drifted or whose open/closed
      state differs (etl.js:205–222) — changed rows only (P9);
    - field_changes: one row per (entity, field) where the desired
      value differs from the cached one (etl.js:286–328), including
      fields never written before.
    """
    st = state.select(
        F.col(key).alias("_sk"),
        F.col("title").alias("_st_title"),
        F.col("state").alias("_st_state"),
        F.col("field_values").alias("_st_fields"),
    )

    creates = desired.join(st, desired[key] == st._sk, "left_anti")

    existing = desired.join(st, desired[key] == st._sk, "inner")
    # null-SAFE drift: plain != is NULL when either side is NULL, so a
    # title/state transition to or from NULL would silently never sync
    # (the reference's JS !== treats null as an ordinary value;
    # r4 code review)
    title_drift = ~F.col("title").eqNullSafe(F.col("_st_title"))
    state_drift = ~F.col("state").eqNullSafe(F.col("_st_state"))
    updates = existing.filter(title_drift | state_drift).select(
        desired["*"],
        title_drift.alias("title_changed"),
        state_drift.alias("state_changed"),
    )

    field_changes = (
        existing.select(
            F.col(key),
            F.explode("field_values").alias("field_name", "new_value"),
            F.col("_st_fields"),
        )
        .withColumn("old_value", F.try_element_at("_st_fields", F.col("field_name")))
        # null-safe: a field CLEARED to NULL against a cached value is
        # a change; never-written + still-NULL is not (r4 code review)
        .filter(~F.col("new_value").eqNullSafe(F.col("old_value")))
        .select(key, "field_name", "new_value", "old_value")
    )

    return UpsertPlan(creates=creates, updates=updates, field_changes=field_changes)


def merge_state(
    state: DataFrame,
    applied: DataFrame,
    key: str = "entity_id",
) -> DataFrame:
    """Post-sink state MERGE (ST2 write-through checkpoint, S6).

    Pure-DataFrame upsert: applied rows replace matching state rows,
    unmatched state rows pass through. With Delta available this is
    `MERGE INTO`; on plain parquet it's an overwrite of the unioned
    keyspace — same semantics, transactionality delegated to the
    table format.
    """
    survivors = state.join(applied, state[key] == applied[key], "left_anti")
    return survivors.unionByName(applied.select(*state.columns))


def advance_migration(state: DataFrame, entities: DataFrame, key: str = "entity_id") -> DataFrame:
    """ST1 phase gate: move matched entities M_CREATED → M_LISTS."""
    # distinct: a re-delivered batch with duplicate entity ids must
    # not fan out state rows through the left join (r4 code review)
    done = entities.select(F.col(key).alias("_mk")).distinct()
    return (
        state.join(done, state[key] == F.col("_mk"), "left")
        .withColumn(
            "migration",
            F.when(
                F.col("_mk").isNotNull() & (F.col("migration") == M_CREATED),
                F.lit(M_LISTS),
            ).otherwise(F.col("migration")),
        )
        .drop("_mk")
    )


def apply_scd2(
    history: DataFrame,
    changes: DataFrame,
    key: str = "entity_id",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Slowly-changing-dimension type 2 apply: versioned history
    instead of overwrite (the audit-grade variant of merge_state).

    ``history``: (key, value, valid_from, valid_to) with valid_to
    null marking the current row. ``changes``: (key, value, ts), at
    most one row per key. A change whose value differs from the
    current row (or that has no current row) closes the current row
    at ts and opens a new one; no-op changes pass through untouched.

    All joins are equi-joins on the entity key — the same uniform
    shuffle as plan_upserts; at scale this is the Delta MERGE WHEN
    MATCHED THEN UPDATE + INSERT pattern with full lineage retained.
    """
    open_rows = history.filter(F.col("valid_to").isNull())
    closed_rows = history.filter(F.col("valid_to").isNotNull())

    ch = changes.select(
        F.col(key).alias("_ck"),
        F.col(value_col).alias("_cv"),
        F.col(ts_col).alias("_cts"),
    )
    cur = open_rows.select(
        F.col(key).alias("_ok"),
        F.col(value_col).alias("_ov"),
        F.lit(True).alias("_has_open"),
    )
    # null-safe effectiveness: clearing a value to NULL CLOSES the
    # open row (plain != dropped it); the _has_open marker keeps the
    # first-ever change for an entity effective even when both the
    # new and (absent) old value are NULL-equal (r4 code review)
    effective = ch.join(cur, ch._ck == cur._ok, "left").filter(
        F.col("_has_open").isNull()
        | ~F.col("_cv").eqNullSafe(F.col("_ov"))
    ).select("_ck", "_cv", "_cts")

    closing = open_rows.join(
        effective, open_rows[key] == effective._ck, "inner"
    ).select(
        open_rows[key],
        open_rows[value_col],
        open_rows["valid_from"],
        F.col("_cts").alias("valid_to"),
    )
    untouched_open = open_rows.join(
        effective, open_rows[key] == effective._ck, "left_anti"
    )
    new_open = effective.select(
        F.col("_ck").alias(key),
        F.col("_cv").alias(value_col),
        F.col("_cts").alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
    )
    return (
        closed_rows.unionByName(untouched_open)
        .unionByName(closing)
        .unionByName(new_open)
    )
