"""Schema evolution on file tables: long-lived 100 TB tables gain
columns over their lifetime; old files must stay readable next to
new ones without a rewrite.

Spark's contract (exercised here): ``mergeSchema`` unions file
schemas, back-filling missing columns with NULL; an explicit
``.schema(...)`` read pins the current schema over any file vintage
(the cheap production path — no footer-merging job); and upcasts
that would lose data fail loudly rather than corrupt.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _write_vintages(spark, path):
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, name string"
    ).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(3, "c", 30.5), (4, "d", 40.25)],
        "id bigint, name string, score double",
    ).write.mode("append").parquet(path)


def test_merge_schema_unions_and_backfills_null(spark, tmp_path):
    path = str(tmp_path / "evolving")
    _write_vintages(spark, path)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows[1] is None and rows[2] is None  # old files backfilled
    assert rows[3] == 30.5 and rows[4] == 40.25
    assert df.filter(F.col("score").isNull()).count() == 2


def test_explicit_schema_pins_current_over_all_vintages(spark, tmp_path):
    path = str(tmp_path / "evolving")
    _write_vintages(spark, path)
    df = spark.read.schema("id bigint, name string, score double").parquet(path)
    assert df.count() == 4
    assert df.filter("score IS NOT NULL").count() == 2
    # projection of a column absent from old files still prunes fine
    assert df.select("name").count() == 4


def test_narrowing_type_change_fails_loudly(spark, tmp_path):
    path = str(tmp_path / "evolving")
    _write_vintages(spark, path)
    # score stored as double; reading as int would truncate -> error
    df = spark.read.schema("id bigint, name string, score int").parquet(path)
    with pytest.raises(Exception) as e:
        df.filter("score IS NOT NULL").collect()
    assert "PARQUET" in str(e.value).upper() or "SCHEMA" in str(e.value).upper()
