"""Relational surface, part 2: outer/fuzzy joins, multi-level aggs,
set ops, sorted collections, date functions, rollup.

Completes the SURVEY.md §2 join/agg/sort inventory on the testdata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trello_github_etl_spark.io import load_table
from trello_github_etl_spark.queries.helpers import disc_price, dsum
from trello_github_etl_spark.registry import query


# ---------------------------------------------------------------------------
# J10 + F15 — left-outer enrichment with sentinel defaults.
# Reference: addIssuesToCardChecklistItems etl.js:334–344; sentinels
# lib/transform.js:279–281.
# ---------------------------------------------------------------------------
@query(
    "j10_left_enrich_sentinel",
    oracle="""
    SELECT
      c.c_custkey,
      COALESCE(big.n_big, 0) AS n_big_orders,
      COALESCE(big.max_price, -1.0) AS max_big_price,
      CASE WHEN big.n_big IS NULL THEN '!Owner' ELSE c.c_name END AS owner
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS n_big, MAX(o_totalprice) AS max_price
      FROM orders WHERE o_totalprice > 400000
      GROUP BY o_custkey
    ) big ON big.o_custkey = c.c_custkey
    """,
)
def j10_left_enrich_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join back-enrichment; missing matches coalesce to sentinels."""
    customer = load_table(spark, sf_dir, "customer")
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_big"), F.max("o_totalprice").alias("max_price"))
    )
    return customer.join(big, customer.c_custkey == big.o_custkey, "left").select(
        "c_custkey",
        F.coalesce(F.col("n_big"), F.lit(0)).alias("n_big_orders"),
        F.coalesce(F.col("max_price"), F.lit(-1.0)).alias("max_big_price"),
        F.when(F.col("n_big").isNull(), F.lit("!Owner"))
        .otherwise(F.col("c_name"))
        .alias("owner"),
    )


# ---------------------------------------------------------------------------
# J6 — fuzzy substring join (trelloUsernameToId, lib/transform.js:189–211):
# case-folded `.includes` against a small member dimension. Physical
# plan: BroadcastNestedLoopJoin — correct at any fact-side scale
# because the dim side stays broadcast.
# ---------------------------------------------------------------------------
@query(
    "j6_fuzzy_substring_join",
    oracle="""
    WITH frags AS (
      SELECT s_suppkey, CAST(s_suppkey % 90 + 10 AS VARCHAR) AS frag
      FROM supplier WHERE s_suppkey % 3 = 0
    )
    SELECT
      c.c_custkey,
      f.s_suppkey AS query_key,
      f.frag
    FROM customer c
    JOIN frags f ON CONTAINS(LOWER(c.c_name), LOWER(f.frag))
    WHERE c.c_custkey % 20 = 0
    """,
)
def j6_fuzzy_substring_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join on substring containment ('johndoe' ~ 'johndoe80').

    The small fragment side is broadcast, so the physical plan is a
    BroadcastNestedLoopJoin — the fact side streams at any scale. The
    scale path for huge dims is a blocking-key prefilter (SURVEY.md §4).
    """
    frags = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 3 == 0)
        .select(
            "s_suppkey",
            (F.col("s_suppkey") % 90 + 10).cast("string").alias("frag"),
        )
    )
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 20 == 0
    )
    return customer.join(
        frags, F.instr(F.lower(customer.c_name), F.lower(frags.frag)) > 0
    ).select("c_custkey", F.col("s_suppkey").alias("query_key"), "frag")


# ---------------------------------------------------------------------------
# J3 — EAV explode + lookup (customFieldItems, lib/transform.js:314–321)
# modeled as posexplode of a built array (the UDTF shape).
# ---------------------------------------------------------------------------
@query(
    "j3_explode_words",
    oracle="""
    SELECT
      p_partkey,
      generate_subscripts(str_split(p_type, ' '), 1) - 1 AS word_pos,
      unnest(str_split(p_type, ' ')) AS word
    FROM part
    WHERE p_partkey % 20 = 0
    """,
)
def j3_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode over a per-row array — the explode/UDTF surface."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 20 == 0)
    return part.select(
        "p_partkey",
        F.posexplode(F.split("p_type", " ")).alias("word_pos", "word"),
    )


# ---------------------------------------------------------------------------
# A2 — two-level markdown aggregation: items → checklist sections →
# card body (mapCardToIssueMkdn lib/transform.js:127–137 over
# mapChecklistToIssueMkdn :149–170).
# ---------------------------------------------------------------------------
@query(
    "a2_order_issue_body",
    oracle="""
    WITH lines AS (
      SELECT
        l_orderkey,
        l_returnflag,
        l_linenumber AS pos,
        CASE WHEN l_linestatus = 'F' THEN '- [x] #' ELSE '- [ ] #' END
          || CAST(l_linenumber AS VARCHAR) AS line
      FROM lineitem
      WHERE l_orderkey % 100 = 0
    ),
    sections AS (
      SELECT
        l_orderkey,
        l_returnflag,
        '## ' || l_returnflag || chr(10) || chr(10)
          || STRING_AGG(line, chr(10) ORDER BY pos, line) || chr(10) AS section
      FROM lines
      GROUP BY l_orderkey, l_returnflag
    )
    SELECT
      s.l_orderkey,
      'Imported from <https://orders.example/' || CAST(s.l_orderkey AS VARCHAR)
        || '>.' || chr(10) || chr(10) || '> ' || ANY_VALUE(o.o_orderpriority)
        || chr(10) || chr(10)
        || STRING_AGG(s.section, chr(10) ORDER BY s.l_returnflag) AS body
    FROM sections s
    JOIN orders o ON o.o_orderkey = s.l_orderkey
    GROUP BY s.l_orderkey
    """,
)
def a2_order_issue_body(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level ordered group-concat building full issue bodies."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    orders = load_table(spark, sf_dir, "orders")
    lines = li.select(
        "l_orderkey",
        "l_returnflag",
        F.col("l_linenumber").alias("pos"),
        F.concat(
            F.when(F.col("l_linestatus") == "F", F.lit("- [x] #")).otherwise(
                F.lit("- [ ] #")
            ),
            F.col("l_linenumber").cast("string"),
        ).alias("line"),
    )
    sections = lines.groupBy("l_orderkey", "l_returnflag").agg(
        F.concat(
            F.lit("## "),
            F.col("l_returnflag"),
            F.lit("\n\n"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
            ),
            F.lit("\n"),
        ).alias("section")
    )
    return (
        sections.join(orders, sections.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.concat(
                F.lit("Imported from <https://orders.example/"),
                F.col("l_orderkey").cast("string"),
                F.lit(">.\n\n> "),
                F.any_value(F.col("o_orderpriority")),
                F.lit("\n\n"),
                F.concat_ws(
                    "\n",
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("l_returnflag", "section"))
                        ),
                        lambda s: s["section"],
                    ),
                ),
            ).alias("body")
        )
    )


# ---------------------------------------------------------------------------
# A3 — distinct-collect report (utils/board-quickview.js:48–55,194–204):
# tagged distinct values across categories, sorted.
# ---------------------------------------------------------------------------
@query(
    "a3_distinct_report",
    oracle="""
    SELECT 'segment' AS category, c_mktsegment AS value FROM customer GROUP BY c_mktsegment
    UNION ALL
    SELECT 'priority' AS category, o_orderpriority AS value FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT 'returnflag' AS category, l_returnflag AS value FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT 'nation' AS category, n_name AS value FROM nation GROUP BY n_name
    """,
)
def a3_distinct_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quickview 'Active X' sections: per-category distincts, unioned."""
    def cat(table: str, col: str, tag: str) -> DataFrame:
        return (
            load_table(spark, sf_dir, table)
            .select(F.lit(tag).alias("category"), F.col(col).alias("value"))
            .distinct()
        )

    return (
        cat("customer", "c_mktsegment", "segment")
        .unionAll(cat("orders", "o_orderpriority", "priority"))
        .unionAll(cat("lineitem", "l_returnflag", "returnflag"))
        .unionAll(cat("nation", "n_name", "nation"))
    )


# ---------------------------------------------------------------------------
# Set operations — absent in the reference (SURVEY.md §2.5), native here.
# ---------------------------------------------------------------------------
@query(
    "setops_order_years",
    oracle="""
    WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'),
         y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
    SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
    UNION ALL
    SELECT 'only95' AS tag, o_custkey FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
    """,
)
def setops_order_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect + except + union over customer-year activity sets."""
    orders = load_table(spark, sf_dir, "orders")

    def year_custs(y: int) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = year_custs(1995), year_custs(1996)
    both = y95.intersect(y96).select(F.lit("both").alias("tag"), "o_custkey")
    # subtract() is distinct EXCEPT (the oracle's semantics);
    # exceptAll only coincided because y95 happens to be distinct
    # (r4 code review)
    only95 = y95.subtract(y96).select(F.lit("only95").alias("tag"), "o_custkey")
    return both.unionAll(only95)


# ---------------------------------------------------------------------------
# O2 — sorted label arrays (_getCardLabels lib/transform.js:323–328).
# ---------------------------------------------------------------------------
@query(
    "o2_sorted_type_arrays",
    oracle="""
    SELECT
      p_brand,
      array_to_string(list_sort(list(DISTINCT p_type)), '|') AS types
    FROM part
    GROUP BY p_brand
    """,
)
def o2_sorted_type_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → sort_array: deterministic sorted label lists,
    serialized '|'-joined (p_type values never contain '|') so the
    output stays driver-hashable — the gate's canonicalizer cannot
    sort/hash list-typed columns."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.array_join(F.sort_array(F.collect_set("p_type")), "|").alias(
            "types"
        )
    )


# ---------------------------------------------------------------------------
# O6 — first-element truncation + warn flag (etl.js:131–146).
# ---------------------------------------------------------------------------
@query(
    "o6_first_label_warn",
    oracle="""
    SELECT
      l_orderkey,
      FIRST(l_returnflag ORDER BY l_linenumber, l_returnflag) AS first_flag,
      COUNT(*) > 1 AS has_more
    FROM lineitem
    WHERE l_orderkey % 40 = 0
    GROUP BY l_orderkey
    """,
)
def o6_first_label_warn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """element_at(sorted, 1) + size>1 warning flag, one hash agg."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 40 == 0)
    first = F.element_at(
        F.sort_array(F.collect_list(F.struct("l_linenumber", "l_returnflag"))), 1
    )["l_returnflag"]
    return li.groupBy("l_orderkey").agg(
        first.alias("first_flag"),
        (F.count("*") > 1).alias("has_more"),
    )


# ---------------------------------------------------------------------------
# Date/time surface (absent in reference; testdata exercises it).
# ---------------------------------------------------------------------------
@query(
    "d1_monthly_revenue",
    oracle="""
    SELECT
      CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY date_trunc('month', o_orderdate)
    """,
)
def d1_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month rollup; date_trunc stays a catalyst expression.

    Both sides cast the truncated month to DATE (Spark's date_trunc
    yields TIMESTAMP, DuckDB's yields DATE).
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month")
    ).agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


@query(
    "d2_date_parts",
    oracle="""
    SELECT
      o_orderkey,
      CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
      CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
      CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS d,
      CAST(o_orderdate AS DATE) AS order_date
    FROM orders
    WHERE o_orderkey % 25 = 0
    """,
)
def d2_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction and cast-to-date."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 25 == 0)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )


# ---------------------------------------------------------------------------
# Rollup / grouping sets (native Spark stretch surface, SURVEY.md §2.4).
# ---------------------------------------------------------------------------
@query(
    "a5_revenue_rollup",
    oracle="""
    SELECT
      COALESCE(l_returnflag, 'ALL') AS returnflag,
      COALESCE(l_linestatus, 'ALL') AS linestatus,
      COUNT(*) AS n,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a5_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with sentinel-coalesced grouping keys."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            dsum("l_extendedprice").alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "revenue",
        )
    )


@query(
    "a6_count_distinct",
    oracle="""
    SELECT
      l_returnflag,
      COUNT(DISTINCT l_partkey) AS n_parts,
      COUNT(DISTINCT l_suppkey) AS n_supps,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a6_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi distinct-aggregate (expand-based plan in Spark)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        dsum("l_quantity").alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# Correlated-scalar shape: top order per customer via join back to a
# grouped max (decorrelated by hand — the plan Catalyst would pick).
# ---------------------------------------------------------------------------
@query(
    "j13_top_order_per_customer",
    oracle="""
    SELECT o.o_custkey, MIN(o.o_orderkey) AS top_orderkey, ANY_VALUE(m.max_price) AS max_price
    FROM orders o
    JOIN (
      SELECT o_custkey, MAX(o_totalprice) AS max_price
      FROM orders GROUP BY o_custkey
    ) m ON m.o_custkey = o.o_custkey AND o.o_totalprice = m.max_price
    GROUP BY o.o_custkey
    """,
)
def j13_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greatest-n-per-group as agg + self-join (ties → min orderkey)."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(F.col("o_custkey").alias("mk")).agg(
        F.max("o_totalprice").alias("max_price")
    )
    return (
        orders.join(
            m,
            (orders.o_custkey == m.mk) & (orders.o_totalprice == m.max_price),
        )
        .groupBy("o_custkey")
        .agg(
            F.min("o_orderkey").alias("top_orderkey"),
            F.any_value("max_price").alias("max_price"),
        )
    )


@query(
    "j6c_fuzzy_blocked_join",
    oracle="""
    WITH frags AS (
      SELECT s_suppkey, CAST(s_suppkey % 900 + 100 AS VARCHAR) AS frag
      FROM supplier WHERE s_suppkey % 3 = 0
    )
    SELECT
      c.c_custkey,
      f.s_suppkey AS query_key,
      f.frag
    FROM customer c
    JOIN frags f ON CONTAINS(LOWER(c.c_name), LOWER(f.frag))
    WHERE c.c_custkey % 20 = 0
    """,
)
def j6c_fuzzy_blocked_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The J6 scale path (SURVEY.md §4 custom-work item 1): substring
    containment as a trigram-blocked EQUI-join.

    frag ⊆ name implies frag's first trigram appears among name's
    trigrams, so joining (name-trigram = frag-first-trigram) yields a
    complete candidate set; the containment predicate then verifies.
    Both sides hash-partition on the trigram key — no nested-loop, no
    broadcast requirement, so it survives a member dim too large to
    broadcast. Each (name, frag) pair surfaces via exactly one
    blocking key (the frag's one trigram × distinct name trigrams), so
    no dedup is needed. The oracle runs the plain containment join —
    results must be identical to prove the blocking loses nothing.
    """
    frags = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 3 == 0)
        .select(
            "s_suppkey",
            (F.col("s_suppkey") % 900 + 100).cast("string").alias("frag"),
        )
        .withColumn("_tri", F.substring(F.lower(F.col("frag")), 1, 3))
    )
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 20 == 0
    )
    name_tris = cust.select(
        "c_custkey",
        "c_name",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, greatest(length(c_name) - 2, 1)),"
                    " i -> substring(lower(c_name), i, 3))"
                )
            )
        ).alias("_tri"),
    )
    return (
        name_tris.join(frags, "_tri")
        .filter(F.instr(F.lower(F.col("c_name")), F.lower(F.col("frag"))) > 0)
        .select("c_custkey", F.col("s_suppkey").alias("query_key"), "frag")
    )


@query(
    "a8_grouping_sets",
    oracle="""
    SELECT
      COALESCE(l_returnflag, 'ALL') AS returnflag,
      COALESCE(l_shipmode_stub, 'ALL') AS linestatus_or_all,
      GROUPING(l_returnflag) * 2 + GROUPING(l_shipmode_stub) AS gid,
      COUNT(*) AS n
    FROM (SELECT l_returnflag, l_linestatus AS l_shipmode_stub FROM lineitem)
    GROUP BY GROUPING SETS ((l_returnflag), (l_shipmode_stub), ())
    """,
)
def a8_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (not expressible as cube/rollup): per-flag,
    per-status, and grand totals in one pass, with grouping_id
    disambiguating sentinel-coalesced keys from real 'ALL' values."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_linestatus").alias("l_shipmode_stub")
    )
    # Spark 4's native DataFrame.groupingSets — the previous SQL-text
    # form registered a createOrReplaceTempView('_a8_src') on the
    # caller's session: a global-namespace side effect that clobbered
    # any same-named view and leaked the scratch registration forever
    # (r4 code review)
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_shipmode_stub"], []],
            "l_returnflag",
            "l_shipmode_stub",
        )
        .agg(
            (
                F.grouping("l_returnflag") * 2 + F.grouping("l_shipmode_stub")
            ).alias("gid"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_shipmode_stub", F.lit("ALL")).alias(
                "linestatus_or_all"
            ),
            "gid",
            "n",
        )
    )


PIVOT_STATUSES = ["F", "O", "P"]


@query(
    "a9_priority_status_pivot",
    oracle=f"""
    SELECT o_orderpriority,
      {", ".join(
        "COUNT(CASE WHEN o_orderstatus = '" + s + "' THEN 1 END)"
        " AS n_" + s for s in PIVOT_STATUSES)},
      {", ".join(
        "CAST(SUM(CASE WHEN o_orderstatus = '" + s + "'"
        " THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)"
        " AS rev_" + s for s in PIVOT_STATUSES)}
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def a9_priority_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide pivot: one row per priority, one (count, revenue) column
    pair per order status. The status values are pinned explicitly —
    at scale an unpinned pivot needs a driver-side distinct pass
    first, and pinning keeps the plan a single hash aggregate with
    conditional measures (no second job, no dynamic schema). The
    oracle is the CASE expansion, which is also exactly what Spark
    lowers pivot to."""
    o = load_table(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", PIVOT_STATUSES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev"),
        )
    )
    cols = [F.col("o_orderpriority")]
    # a (priority, status) combination with no rows pivots to NULL,
    # while the oracle's COUNT(CASE ...) yields 0 — align on 0
    cols += [
        F.coalesce(F.col(f"{s}_n"), F.lit(0)).alias(f"n_{s}")
        for s in PIVOT_STATUSES
    ]
    cols += [F.col(f"{s}_rev").alias(f"rev_{s}") for s in PIVOT_STATUSES]
    return p.select(*cols)


@query(
    "j14_null_safe_join",
    oracle="""
    WITH l AS (
      SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS pkey,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS pkey,
             COUNT(*) AS n_big
      FROM orders WHERE o_totalprice > 100000 GROUP BY 1
    )
    SELECT l.pkey, l.n_orders, COALESCE(r.n_big, 0) AS n_big
    FROM l LEFT JOIN r ON l.pkey IS NOT DISTINCT FROM r.pkey
    ORDER BY l.pkey NULLS FIRST
    """,
)
def j14_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>``): NULL keys match each other —
    the semantics a plain equi-join silently drops. Catalyst treats
    ``eqNullSafe`` as a hashable equi-condition, so this still plans
    as a broadcast/hash join (NOT a nested loop); at 100 TB the only
    caveat is that a heavy NULL group is a skew key like any other
    (salt it if hot)."""
    o = load_table(spark, sf_dir, "orders")
    pkey = F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM"))
    l = o.groupBy(pkey.alias("pkey")).agg(F.count(F.lit(1)).alias("n_orders"))
    r = (
        o.filter(F.col("o_totalprice") > 100000)
        .groupBy(pkey.alias("pkey"))
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    return (
        l.join(r.withColumnRenamed("pkey", "rkey"),
               F.col("pkey").eqNullSafe(F.col("rkey")), "left")
        .select("pkey", "n_orders", F.coalesce("n_big", F.lit(0)).alias("n_big"))
        .orderBy(F.col("pkey").asc_nulls_first())
    )
