"""Pure-SQL interface parity: each query here is ONE ANSI-SQL string
executed verbatim by BOTH engines — ``spark.sql`` over the registered
temp views, and DuckDB as the oracle. No DataFrame code, no dialect
forks: the strongest possible statement that the SQL front door of
this engine matches a reference engine.

Constraints that keep the shared text exact on both sides: decimal
casts around FP sums, explicit CAST(... AS DOUBLE) at the end, unique
tie-break keys in every ORDER BY / window, and ANSI-only syntax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from trello_github_etl_spark.io import register_temp_views
from trello_github_etl_spark.registry import query


def _shared(name: str, sql: str) -> None:
    @query(name, oracle=sql)
    def run(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        register_temp_views(spark, sf_dir)
        return spark.sql(_sql)

    run.__name__ = name
    run.__doc__ = "Shared-text SQL (same string runs on Spark and DuckDB)."


_shared(
    "sql1_region_revenue",
    """
    SELECT r.r_name AS region_name,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    """,
)

_shared(
    "sql2_priority_rank_windows",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rnk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders
    ) t
    WHERE rnk <= 3
    """,
)

_shared(
    "sql3_status_case_rollup",
    """
    SELECT
      CASE o_orderstatus
        WHEN 'O' THEN 'open' WHEN 'F' THEN 'done' ELSE 'other' END AS bucket,
      MIN(o_orderdate) AS first_date,
      MAX(o_orderdate) AS last_date,
      COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY
      CASE o_orderstatus
        WHEN 'O' THEN 'open' WHEN 'F' THEN 'done' ELSE 'other' END
    """,
)

_shared(
    "sql4_customer_order_exists",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n_without_recent
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01'
    )
    GROUP BY c.c_mktsegment
    """,
)
