"""Incremental view maintenance queries: the materialized-rollup
refresh path (operators/ivm.py). Each query maintains a view through
delta merges / retractions and the oracle RECOMPUTES the same view
from scratch — passing means incremental == recompute, the IVM
correctness contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trello_github_etl_spark.io import load_table
from trello_github_etl_spark.operators import ivm
from trello_github_etl_spark.registry import query

_CUTOFF = "1998-01-01"
_DEC = "decimal(18,2)"


def _priority_state(orders: DataFrame) -> DataFrame:
    """Aggregate state per priority: count + EXACT decimal revenue sum
    (exact types are what make merge order-insensitive)."""
    return orders.groupBy("o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast(_DEC)).alias("sum_total"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def _finalize(state: DataFrame) -> DataFrame:
    return state.select(
        "o_orderpriority",
        F.col("n_rows"),
        F.col("sum_total").cast("double").alias("sum_total"),
    ).orderBy("o_orderpriority")


@query(
    "ivm1_delta_merge",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def ivm1_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a per-priority revenue rollup across a batch boundary:
    state built from pre-cutoff orders, a delta batch of post-cutoff
    orders merged in (one shuffle on the group key, |delta| + |state|
    rows touched — never the base table). Oracle recomputes from all
    orders; equality IS the IVM contract."""
    o = load_table(spark, sf_dir, "orders")
    state = _priority_state(o.filter(F.col("o_orderdate") < _CUTOFF))
    delta = _priority_state(o.filter(F.col("o_orderdate") >= _CUTOFF))
    merged = ivm.merge_agg_state(
        state, delta, keys=["o_orderpriority"], measures=["sum_total"]
    )
    return _finalize(merged)


@query(
    "ivm2_retraction",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def ivm2_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retract deleted rows from the maintained view: negate the
    deleted rows' aggregate contribution and merge. Oracle recomputes
    the view without the deleted rows. Groups whose maintained count
    hits zero drop out of the view (ivm.merge_agg_state filter)."""
    o = load_table(spark, sf_dir, "orders")
    state = _priority_state(o)
    deleted = _priority_state(o.filter(F.col("o_orderstatus") == "F"))
    retract = ivm.retraction(
        deleted, keys=["o_orderpriority"], measures=["sum_total"]
    )
    merged = ivm.merge_agg_state(
        state, retract, keys=["o_orderpriority"], measures=["sum_total"]
    )
    return _finalize(merged)


@query(
    "ivm3_rollup_cascade",
    oracle="""
    SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
           event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY month, event_type
    """,
)
def ivm3_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity continuous aggregates: the DAILY rollup is
    maintained from the base stream (ivm1 pattern), and the MONTHLY
    rollup is maintained FROM THE DAILY STATE — base rows are touched
    exactly once per refresh no matter how many granularities stack
    on top (the hypertable continuous-aggregate cascade). Works
    because the state is associative (counts + exact decimal sums):
    re-aggregating finer state IS the coarser state. Oracle computes
    monthly straight from the base table; equality proves the
    cascade loses nothing."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "event_type",
    ).agg(
        F.sum(F.col("value").cast(_DEC)).alias("sum_value"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    monthly = (
        daily.groupBy(
            F.date_trunc("month", F.col("day")).cast("date").alias("month"),
            "event_type",
        )
        .agg(
            F.sum("sum_value").alias("sum_value"),
            F.sum("n_rows").alias("n_rows"),
        )
    )
    return monthly.select(
        "month",
        "event_type",
        "n_rows",
        F.col("sum_value").cast("double").alias("sum_value"),
    ).orderBy("month", "event_type")


@query(
    "ivm4_join_view_delta",
    oracle=f"""
    WITH a AS (
      SELECT o_orderkey, o_orderpriority FROM orders
      WHERE o_orderdate < TIMESTAMP '{_CUTOFF}'
    ),
    da AS (
      SELECT o_orderkey, o_orderpriority FROM orders
      WHERE o_orderdate >= TIMESTAMP '{_CUTOFF}'
    ),
    b AS (
      SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_linenumber <= 3
    ),
    db AS (
      SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_linenumber > 3
    ),
    full_v AS (
      SELECT o.o_orderkey, o.o_orderpriority, l.l_linenumber, l.l_quantity
      FROM (SELECT * FROM a UNION ALL SELECT * FROM da) o
      JOIN (SELECT * FROM b UNION ALL SELECT * FROM db) l
        ON o.o_orderkey = l.l_orderkey
    ),
    old_v AS (
      SELECT o.o_orderkey, o.o_orderpriority, l.l_linenumber, l.l_quantity
      FROM a o JOIN b l ON o.o_orderkey = l.l_orderkey
    )
    SELECT * FROM full_v EXCEPT ALL SELECT * FROM old_v
    """,
)
def ivm4_join_view_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view: new orders (ΔA, the
    post-cutoff batch) and late-arriving lineitems (ΔB, linenumber
    > 3) refresh the materialized orders⋈lineitem view through the
    bilinear delta ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB — the view is never
    re-joined. The ORACLE computes the delta SEMANTICALLY —
    (A∪ΔA)⋈(B∪ΔB) EXCEPT ALL A⋈B — so a hash match PROVES the
    incremental algebra equals recompute-minus-old on the full
    multiset, cross term and all (dropping ΔA⋈ΔB double-counts or
    misses rows matching only across the deltas; this gate catches
    exactly that class)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_quantity"
    )
    cut = F.lit(_CUTOFF).cast("timestamp")
    a = o.filter(F.col("o_orderdate") < cut).drop("o_orderdate")
    da = o.filter(F.col("o_orderdate") >= cut).drop("o_orderdate")
    b = li.filter(F.col("l_linenumber") <= 3)
    db = li.filter(F.col("l_linenumber") > 3)
    return ivm.join_view_delta(a, da, b, db, on="o_orderkey").select(
        "o_orderkey", "o_orderpriority", "l_linenumber", "l_quantity"
    )


@query(
    "ivm5_signed_join_delta",
    oracle=f"""
    WITH a AS (
      SELECT o_orderkey, o_orderpriority FROM orders
      WHERE o_orderdate < TIMESTAMP '{_CUTOFF}'
    ),
    ins_a AS (
      SELECT o_orderkey, o_orderpriority FROM orders
      WHERE o_orderdate >= TIMESTAMP '{_CUTOFF}'
    ),
    new_a AS (
      SELECT * FROM a WHERE o_orderkey % 7 <> 0
      UNION ALL SELECT * FROM ins_a
    ),
    b AS (
      SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_linenumber <= 3
    ),
    ins_b AS (
      SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_linenumber IN (4, 5)
    ),
    new_b AS (
      SELECT * FROM b WHERE l_orderkey % 5 <> 0
      UNION ALL SELECT * FROM ins_b
    ),
    oldv AS (
      SELECT o.o_orderkey, o.o_orderpriority, l.l_linenumber, l.l_quantity
      FROM a o JOIN b l ON o.o_orderkey = l.l_orderkey
    ),
    newv AS (
      SELECT o.o_orderkey, o.o_orderpriority, l.l_linenumber, l.l_quantity
      FROM new_a o JOIN new_b l ON o.o_orderkey = l.l_orderkey
    ),
    co AS (
      SELECT o_orderkey, o_orderpriority, l_linenumber, l_quantity,
             COUNT(*) AS c
      FROM oldv GROUP BY ALL
    ),
    cn AS (
      SELECT o_orderkey, o_orderpriority, l_linenumber, l_quantity,
             COUNT(*) AS c
      FROM newv GROUP BY ALL
    )
    SELECT o_orderkey, o_orderpriority, l_linenumber, l_quantity,
           CAST(COALESCE(cn.c, 0) - COALESCE(co.c, 0) AS BIGINT) AS net
    FROM cn FULL JOIN co
      USING (o_orderkey, o_orderpriority, l_linenumber, l_quantity)
    WHERE COALESCE(cn.c, 0) - COALESCE(co.c, 0) <> 0
    """,
)
def ivm5_signed_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-view maintenance under a MIXED batch — new orders arrive
    (+1), every %7 old order is deleted (-1), late lineitems arrive
    (+1), every %5 order's early lineitems are deleted (-1) — through
    the signed bilinear identity with sign multiplication on the
    cross term (the Z-relation algebra DBSP/differential dataflow
    maintain views in). The oracle recomputes BOTH view versions and
    diffs their per-row counts, so a hash match proves the signed
    incremental algebra equals new-minus-old on the full multiset —
    including cancellations (a deleted order x an inserted lineitem
    of one key produces +1/-1 of the same tuple via different terms;
    the netting aggregate must zero them)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_quantity"
    )
    cut = F.lit(_CUTOFF).cast("timestamp")
    a = o.filter(F.col("o_orderdate") < cut).drop("o_orderdate")
    da = (
        o.filter(F.col("o_orderdate") >= cut)
        .drop("o_orderdate")
        .withColumn("sign", F.lit(1))
        .unionByName(
            a.filter(F.col("o_orderkey") % 7 == 0).withColumn(
                "sign", F.lit(-1)
            )
        )
    )
    b = li.filter(F.col("l_linenumber") <= 3)
    db = (
        li.filter(F.col("l_linenumber").isin(4, 5))
        .withColumn("sign", F.lit(1))
        .unionByName(
            b.filter(F.col("o_orderkey") % 5 == 0).withColumn(
                "sign", F.lit(-1)
            )
        )
    )
    return ivm.signed_join_view_delta(
        a, da, b, db,
        on="o_orderkey",
        view_cols=["o_orderkey", "o_orderpriority", "l_linenumber", "l_quantity"],
    )
