"""Salting operators: exactness vs the unsalted plan + plan shape."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from trello_github_etl_spark.operators import skew


def test_salted_agg_equals_plain_agg(spark):
    df = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold", float(i) / 7) for i in range(1000)],
        "id long, k string, v double",
    )
    salted = {
        (r.k): (r.n, r.sum_value)
        for r in skew.salted_count_sum(df, "k", "v", "id", buckets=8).collect()
    }
    plain = {
        (r.k): (r.n, r.sum_value)
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast(skew.DEC)).cast("double").alias("sum_value"),
        )
        .collect()
    }
    assert salted == plain


def test_salted_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(300)], "id long, k string"
    )
    dim = spark.createDataFrame([("a", 1), ("b", 2)], "k string, payload int")
    salted = sorted(
        (r.id, r.payload)
        for r in skew.salted_join(fact, dim, "k", "id", buckets=4).collect()
    )
    plain = sorted((r.id, r.payload) for r in fact.join(dim, "k").collect())
    assert salted == plain


def test_salted_agg_plan_shuffles_on_salt(spark):
    df = spark.createDataFrame([(1, "k", 1.0)], "id long, k string, v double")
    buf = io.StringIO()
    with redirect_stdout(buf):
        skew.salted_count_sum(df, "k", "v", "id").explain()
    plan = buf.getvalue()
    # phase-1 exchange carries the salt; phase-2 exchange is key-only
    assert "_salt" in plan
    assert plan.count("Exchange hashpartitioning") == 2
