"""Versioned state store: commit atomicity, snapshot reads, time
travel, MERGE semantics, orphan tolerance, vacuum."""

from __future__ import annotations

import os

import pytest

from trello_github_etl_spark.plans.state_store import VersionedStateStore


def _df(spark, rows):
    return spark.createDataFrame(rows, ["entity_id", "title"])


@pytest.fixture()
def store(tmp_path):
    return VersionedStateStore(str(tmp_path / "state"))


def test_commit_read_and_time_travel(spark, store):
    store.commit(_df(spark, [("a", "t1")]))
    store.commit(_df(spark, [("a", "t2"), ("b", "t1")]))
    assert store.latest_version() == 2
    assert {r.title for r in store.read(spark).collect()} == {"t2", "t1"}
    old = store.read(spark, version=1).collect()
    assert len(old) == 1 and old[0].title == "t1"
    ops = [c.op for c in store.history()]
    assert ops == ["overwrite", "overwrite"]


def test_merge_replaces_matches_keeps_rest(spark, store):
    store.commit(_df(spark, [("a", "t1"), ("b", "t1")]))
    store.merge(_df(spark, [("b", "t9"), ("c", "t1")]))
    got = {r.entity_id: r.title for r in store.read(spark).collect()}
    assert got == {"a": "t1", "b": "t9", "c": "t1"}
    # idempotent re-apply: same applied frame -> same table
    store.merge(_df(spark, [("b", "t9"), ("c", "t1")]))
    got2 = {r.entity_id: r.title for r in store.read(spark).collect()}
    assert got2 == got


def test_orphan_directory_is_invisible(spark, store):
    store.commit(_df(spark, [("a", "t1")]))
    # simulate a writer that crashed after writing data but BEFORE
    # publishing: the directory exists, the manifest never updated
    _df(spark, [("zz", "junk")]).write.parquet(
        os.path.join(store.root, "v00000002")
    )
    assert store.latest_version() == 1
    assert [r.entity_id for r in store.read(spark).collect()] == ["a"]
    with pytest.raises(ValueError):
        store.read(spark, version=2)  # unpublished => not a version


def test_empty_store_refuses_reads(spark, store):
    with pytest.raises(ValueError):
        store.read(spark)


def test_vacuum_drops_old_keeps_current(spark, store):
    store.commit(_df(spark, [("a", "t1")]))
    store.commit(_df(spark, [("a", "t2")]))
    store.commit(_df(spark, [("a", "t3")]))
    removed = store.vacuum(keep_last=1)
    assert 1 in removed and 2 in removed
    assert store.read(spark).collect()[0].title == "t3"
    with pytest.raises(ValueError):
        store.read(spark, version=1)
