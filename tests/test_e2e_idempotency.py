"""End-to-end resumable-ETL semantics (the reference's core contract):
plan → sink → state MERGE → re-plan is a fixpoint, and drift produces
exactly the changed rows (etl.js J9/P9/ST1/ST2 as pure CDC)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from trello_github_etl_spark.plans.upserts import (
    M_CREATED,
    M_LISTS,
    STATE_SCHEMA,
    advance_migration,
    merge_state,
    plan_upserts,
)
from trello_github_etl_spark.sources.rest_sink import SinkConfig, run_sink


def _desired(spark, rows):
    return spark.createDataFrame(
        rows,
        "entity_id string, title string, state string,"
        " field_values map<string,string>",
    )


def _applied_state(creates):
    """Shape sink-acknowledged creates into STATE_SCHEMA records."""
    return creates.select(
        F.lit("card").alias("entity_kind"),
        "entity_id",
        F.row_number()
        .over(Window.orderBy("entity_id"))
        .cast("long")
        .alias("issue_number"),
        "title",
        F.lit("").alias("body"),
        "state",
        F.lit(M_CREATED).cast("long").alias("migration"),
        "field_values",
    )


def test_full_cycle_is_idempotent_and_drift_aware(spark, tmp_path):
    desired = _desired(
        spark,
        [
            ("c1", "Task one", "open", {"Status": "Pending"}),
            ("c2", "Task two", "open", {"Status": "Considering"}),
            ("c3", "Task three", "closed", {}),
        ],
    )
    state0 = spark.createDataFrame([], STATE_SCHEMA)

    # first run: everything is a create, nothing is an update
    plan1 = plan_upserts(desired, state0)
    assert plan1.creates.count() == 3
    assert plan1.updates.count() == 0
    assert plan1.field_changes.count() == 0

    # sink the creates through the mock transport (no throttling in test)
    log = tmp_path / "sink.jsonl"

    def transport(payload):
        with open(log, "a") as f:
            f.write(json.dumps({"id": payload["entity_id"]}) + "\n")

    run_sink(plan1.creates, transport, SinkConfig(sleep_s=0.0), sleep=lambda s: None)
    assert sorted(json.loads(l)["id"] for l in open(log)) == ["c1", "c2", "c3"]

    # ST2 write-through + ST1 phase gate
    applied = _applied_state(plan1.creates)
    state1 = advance_migration(merge_state(state0, applied), applied)
    assert {r.migration for r in state1.collect()} == {M_LISTS}

    # second run with identical input: a fixpoint — zero work planned
    plan2 = plan_upserts(desired, state1)
    assert plan2.creates.count() == 0
    assert plan2.updates.count() == 0
    assert plan2.field_changes.count() == 0

    # drift: one retitled card, one new entity, one changed field
    desired2 = _desired(
        spark,
        [
            ("c1", "Task one RENAMED", "open", {"Status": "Pending"}),
            ("c2", "Task two", "open", {"Status": "Done"}),
            ("c3", "Task three", "closed", {}),
            ("c4", "Task four", "open", {}),
        ],
    )
    plan3 = plan_upserts(desired2, state1)
    assert [r.entity_id for r in plan3.creates.collect()] == ["c4"]
    [upd] = plan3.updates.collect()
    assert (upd.entity_id, upd.title_changed, upd.state_changed) == ("c1", True, False)
    [fc] = plan3.field_changes.collect()
    assert (fc.entity_id, fc.field_name, fc.old_value, fc.new_value) == (
        "c2",
        "Status",
        "Considering",
        "Done",
    )


def test_scd2_apply_semantics(spark):
    from trello_github_etl_spark.plans.upserts import apply_scd2
    import datetime as dt

    t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1)
    history = spark.createDataFrame(
        [
            ("a", "v1", t0, None),   # will change → close + reopen
            ("b", "v1", t0, None),   # no-op change → untouched
            ("c", "v0", t0, t0),     # already closed → passes through
        ],
        "entity_id string, value string, valid_from timestamp_ntz,"
        " valid_to timestamp_ntz",
    )
    changes = spark.createDataFrame(
        [("a", "v2", t1), ("b", "v1", t1), ("d", "v9", t1)],
        "entity_id string, value string, ts timestamp_ntz",
    )
    rows = {
        (r.entity_id, r.value, r.valid_from, r.valid_to)
        for r in apply_scd2(history, changes).collect()
    }
    assert rows == {
        ("a", "v1", t0, t1),    # closed at change ts
        ("a", "v2", t1, None),  # new current version
        ("b", "v1", t0, None),  # no-op untouched
        ("c", "v0", t0, t0),    # closed history preserved
        ("d", "v9", t1, None),  # brand-new entity
    }
