"""Relational core: scans, filters, projections, joins, aggregations.

Each query re-expresses an operator family from the reference
(SURVEY.md §2, cited per-query) on the driver testdata tables.
Spark-first: broadcast hints on true dimensions, decimal-exact
aggregates (see helpers.py), explicit orderings everywhere an
ordering is semantically observable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trello_github_etl_spark.io import load_table
from trello_github_etl_spark.queries.helpers import (
    SQL_DISC_PRICE,
    davg,
    disc_price,
    dsum,
)
from trello_github_etl_spark.registry import query


# ---------------------------------------------------------------------------
# P1/P2 — predicate filters + projection
# Reference: closed-card filter lib/transform.js:260–264, etl.js:26–29;
# projection mapCardToIssue lib/transform.js:72–84.
# ---------------------------------------------------------------------------
@query(
    "p1_filter_open_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_orderstatus = 'O'
    """,
)
def p1_filter_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-row filter (P1 analog): predicate reaches the parquet scan."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )


# ---------------------------------------------------------------------------
# A4 — grouped aggregation with partial (map-side) combine.
# Reference consumes precomputed badges counts (README.md:291–296); we
# compute them. Shape = TPC-H Q1 pricing summary.
# ---------------------------------------------------------------------------
@query(
    "a4_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a4_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with map-side partials; decimal-exact measures."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price()).cast("double").alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# J2/J3/J5 — broadcast lookup joins against tiny dimensions.
# Reference: linear .find() lookups lib/transform.js:307–321, 213–221;
# Spark replaces the O(n·m) scan with a broadcast hash join.
# ---------------------------------------------------------------------------
@query(
    "j2_customer_geo_rollup",
    oracle="""
    SELECT
      r.r_name AS region_name,
      n.n_name AS nation_name,
      COUNT(*) AS n_customers,
      CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def j2_customer_geo_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension lookup as broadcast hash join (J2/J5 analog)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("sum_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# J1 — parent↔child equi-join (checklists→cards re-nest,
# lib/transform.js:223–255) as orders⋈lineitem with per-parent rollup.
# ---------------------------------------------------------------------------
@query(
    "j1_order_line_rollup",
    oracle=f"""
    SELECT
      o.o_orderkey,
      o.o_orderstatus,
      COUNT(l.l_orderkey) AS n_lines,
      CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderstatus
    """,
)
def j1_order_line_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent-child rollup with the aggregate pushed BELOW the join:
    the group key (o_orderkey) is the join key and every measure comes
    from lineitem, so lines pre-aggregate to one row per order before
    meeting orders — the join input shrinks ~4x, order columns never
    ride through the agg shuffle, and both shuffles share the orderkey
    partitioning (measured ~30% faster at sf0.1; the gap widens with
    lines-per-order at full scale)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("l_orderkey").alias("n_lines"),
        dsum("l_quantity").alias("sum_qty"),
        F.sum(disc_price()).cast("double").alias("revenue"),
    )
    return orders.join(per_order, per_order.l_orderkey == orders.o_orderkey).select(
        "o_orderkey", "o_orderstatus", "n_lines", "sum_qty", "revenue"
    )


# ---------------------------------------------------------------------------
# J9 — existence check vs state table as an explicit anti-join.
# Reference: "already created?" etl.js:42–46, 194–199.
# ---------------------------------------------------------------------------
@query(
    "j9_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j9_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join — the create-set of the reference's upsert planner."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "j9_customers_with_orders_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j9_customers_with_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join — the update-set counterpart (etl.js:194–199)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


# ---------------------------------------------------------------------------
# A1/A2 + F6 — ordered group-concat rendering markdown checklists.
# Reference: mapChecklistToIssueMkdn lib/transform.js:149–170 (sorted
# per-group concat), checkbox render :179–187.
# ---------------------------------------------------------------------------
@query(
    "a1_order_markdown_checklist",
    oracle="""
    WITH lines AS (
      SELECT
        l_orderkey,
        l_linenumber AS pos,
        CASE WHEN l_returnflag = 'R'
             THEN '- [x] #' || CAST(l_linenumber AS VARCHAR) || ' qty ' || CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR)
             ELSE '- [ ] #' || CAST(l_linenumber AS VARCHAR) || ' qty ' || CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR)
        END AS line
      FROM lineitem
      WHERE l_orderkey % 50 = 0
    )
    SELECT
      l_orderkey,
      COUNT(*) AS n_items,
      STRING_AGG(line, chr(10) ORDER BY pos, line) AS checklist_md
    FROM lines
    GROUP BY l_orderkey
    """,
)
def a1_order_markdown_checklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group sorted markdown aggregation (A1/A2/F6 analog).

    Spark side: collect_list(struct(pos, line)) → sort_array →
    concat_ws, i.e. one hash aggregate, no window shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    qty_str = F.col("l_quantity").cast("decimal(18,2)").cast("string")
    line = F.concat(
        F.when(F.col("l_returnflag") == "R", F.lit("- [x] #")).otherwise(
            F.lit("- [ ] #")
        ),
        F.col("l_linenumber").cast("string"),
        F.lit(" qty "),
        qty_str,
    )
    return (
        li.select("l_orderkey", F.col("l_linenumber").alias("pos"), line.alias("line"))
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_items"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s.line,
                ),
            ).alias("checklist_md"),
        )
    )


# ---------------------------------------------------------------------------
# O4 — deterministic top-k (find-first/limit, etl.js:388–392).
# ---------------------------------------------------------------------------
@query(
    "o4_top10_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def o4_top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k via TakeOrderedAndProject; total order via key tie-break."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# O1 — per-group ordering via window (checklist pos sort,
# lib/transform.js:245–250).
# ---------------------------------------------------------------------------
@query(
    "o1_top3_orders_per_segment",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn
    FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY c.c_mktsegment
               ORDER BY o.o_totalprice DESC, o.o_orderkey
             ) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) t
    WHERE rn <= 3
    """,
)
def o1_top3_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed per-group top-k with a total order inside each partition."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
