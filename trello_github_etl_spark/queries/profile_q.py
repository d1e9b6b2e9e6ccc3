"""Table profiling: the ANALYZE-style per-column statistics pass that
feeds cost-based optimization (row counts, null counts, NDV, min/max
— what `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS` persists to
a catalog, here surfaced as a queryable result).

Scale shape: ONE aggregation pass over the table computes every
column's stats together (count/min/max fold map-side; the exact
multi-column COUNT(DISTINCT) expands rows k-fold before the shuffle —
the exact-NDV cost a profiler pays; swap approx_count_distinct's HLL
sketch at 100 TB, noted per-query). The single stats row is then
unpivoted driver-cheap with ``stack``.

Determinism: doubles never stringify directly (engine float→text
rules differ); money goes through DECIMAL(18,2) first, timestamps
through the shared 'yyyy-MM-dd HH:mm:ss' cast text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trello_github_etl_spark.io import load_table
from trello_github_etl_spark.registry import query

# (column, min/max cast expression template) — o_totalprice routes
# through DECIMAL so both engines print identical text.
_ORDER_COLS = [
    ("o_orderkey", "{m}"),
    ("o_custkey", "{m}"),
    ("o_orderstatus", "{m}"),
    ("o_totalprice", "CAST({m} AS DECIMAL(18,2))"),
    ("o_orderdate", "{m}"),
    ("o_orderpriority", "{m}"),
]


def _oracle() -> str:
    parts = []
    for c, tpl in _ORDER_COLS:
        mn = tpl.format(m=f"MIN({c})")
        mx = tpl.format(m=f"MAX({c})")
        parts.append(
            f"""
    SELECT '{c}' AS col_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT({c}) AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST({mn} AS VARCHAR) AS min_s,
           CAST({mx} AS VARCHAR) AS max_s
    FROM orders"""
        )
    return "\n    UNION ALL".join(parts)


@query("prof1_orders_stats", oracle=_oracle())
def prof1_orders_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-column profile of ``orders`` in one aggregation pass
    + a stack unpivot. At 100 TB replace each countDistinct with
    approx_count_distinct (HLL) to drop the expand."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c, tpl in _ORDER_COLS:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_nd_{c}"))
        aggs.append(
            F.expr(tpl.format(m=f"MIN({c})")).cast("string").alias(f"_min_{c}")
        )
        aggs.append(
            F.expr(tpl.format(m=f"MAX({c})")).cast("string").alias(f"_max_{c}")
        )
    one = o.agg(*aggs)
    tuples = ", ".join(
        f"'{c}', _n, _n - _nn_{c}, _nd_{c}, _min_{c}, _max_{c}"
        for c, _ in _ORDER_COLS
    )
    return one.selectExpr(
        f"stack({len(_ORDER_COLS)}, {tuples}) AS "
        "(col_name, n_rows, n_nulls, n_distinct, min_s, max_s)"
    )
