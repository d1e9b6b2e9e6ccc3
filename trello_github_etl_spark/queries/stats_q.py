"""Statistical / reshaping surface: deterministic moments, histograms,
edit-distance fuzzy matching, forward-fill windows, unpivot (melt),
argmax aggregation, and array higher-order functions.

Extends the SURVEY.md §2 inventory (fuzzy family J6/J7; distinct
report A3; window family) with the remaining analytics staples a
reference user would expect from a general engine.

Determinism notes (driver hashes exact values):
- Variance / stddev / correlation are order-dependent when computed
  by streaming aggregators over doubles, and Spark's VAR_SAMP/CORR
  would not bit-match DuckDB's. Both are derived here from EXACT
  decimal power sums (Sx, Sxx, Sxy, ...) with the final closed-form
  arithmetic done in IEEE doubles with identical expression order on
  both engines -> bit-identical results AND partitioning-invariant.
- Forward-fill copies input doubles untouched (no arithmetic).
- Array folds run over explicitly sorted arrays in decimal.

Scale notes are per-query below; the headline: every aggregate here
is map-side combinable (power sums, max_by) — none require a
whole-partition sort the way window-function formulations do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trello_github_etl_spark.io import load_table
from trello_github_etl_spark.registry import query

# Shared closed-form expressions (kept textually identical between the
# Spark F.expr side and the DuckDB oracle so double arithmetic runs in
# the same order on both engines). The final metrics are ROUNDed to 6
# decimals: the power sums whose raw integer exceeds 2^63 (syy at
# scale 8) convert decimal->double differently per engine (Spark: one
# correctly-rounded conversion from the exact value; DuckDB:
# int128->double then /10^scale — two roundings), a 1-ULP disagreement
# ~1e-18 relative. Rounding at 6 dp is 12 orders of magnitude above
# that noise floor, so both engines round to the same rational and
# produce the same double.
_MEAN = "ROUND(sx / n, 6)"
_VAR_RAW = "(sxx - sx * sx / n) / (n - 1.0)"
_VAR = f"ROUND({_VAR_RAW}, 6)"
_STD = f"ROUND(SQRT({_VAR_RAW}), 6)"
_CORR = (
    "ROUND((n * sxy - sx * sy) / "
    "(SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6)"
)


# ---------------------------------------------------------------------------
# prof2 — second moments & correlation from exact power sums.
# ---------------------------------------------------------------------------
@query(
    "prof2_moments",
    oracle=f"""
    WITH sums AS (
      SELECT
        l_returnflag,
        CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
                 * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                 * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS syy,
        CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
                 * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT
      l_returnflag,
      CAST(n AS BIGINT) AS n_rows,
      {_MEAN} AS qty_mean,
      {_VAR} AS qty_var,
      {_STD} AS qty_std,
      {_CORR} AS qty_price_corr
    FROM sums
    ORDER BY l_returnflag
    """,
)
def prof2_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev / Pearson correlation per return flag.

    Computed from five exact DECIMAL power sums + closed-form double
    arithmetic, NOT Spark's streaming VAR_SAMP/CORR — this is both
    deterministic (bit-equal to the oracle) and fully map-side
    combinable: at 100 TB the shuffle carries 5 decimals per group
    per map task, the same profile as a plain SUM. Reference analog:
    the quickview distinct report (utils/board-quickview.js:48-55) is
    the only stats pass in the reference; this is the engine-grade
    extension of that surface.
    """
    li = load_table(spark, sf_dir, "lineitem")
    d = "decimal(19,4)"
    x = F.col("l_quantity").cast(d)
    y = F.col("l_extendedprice").cast(d)
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    return (
        sums.select(
            "l_returnflag",
            F.col("n").cast("bigint").alias("n_rows"),
            F.expr(_MEAN).alias("qty_mean"),
            F.expr(_VAR).alias("qty_var"),
            F.expr(_STD).alias("qty_std"),
            F.expr(_CORR).alias("qty_price_corr"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# hist1 — fixed-width numeric histogram.
# ---------------------------------------------------------------------------
@query(
    "hist1_price_histogram",
    oracle="""
    SELECT
      LEAST(CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT), 9) AS bucket,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_total
    FROM orders
    GROUP BY 1
    ORDER BY bucket
    """,
)
def hist1_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (cap bucket = 9).

    The bucket id is computed arithmetically (FLOOR of an IEEE double
    division — identical on both engines), so the whole query is one
    map-side-combinable hash aggregate over ~10 groups: the 100 TB
    plan moves 10 rows per map task. A width_bucket/NTILE formulation
    would need a global sort or a two-pass min/max; fixed bounds are
    the scan-once scale path.
    """
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("bigint"), F.lit(9)
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("bucket_total"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# fz1 — edit-distance fuzzy pairing (J6-family completion).
# ---------------------------------------------------------------------------
@query(
    "fz1_levenshtein_pairs",
    oracle="""
    WITH names AS (
      SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY p_name
    )
    SELECT
      a.p_name AS name_a,
      b.p_name AS name_b,
      levenshtein(a.p_name, b.p_name) AS dist,
      a.n_parts * b.n_parts AS pair_weight
    FROM names a JOIN names b
      ON a.p_name < b.p_name
     AND ABS(LENGTH(a.p_name) - LENGTH(b.p_name)) <= 2
     AND levenshtein(a.p_name, b.p_name) <= 2
    ORDER BY dist, name_a, name_b
    """,
)
def fz1_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names by Levenshtein distance <= 2.

    Completes the fuzzy-join family (SURVEY §2.3 J6 substring /
    lib/transform.js:189-211) with true edit distance. Scale design:
    the theta join runs over DISTINCT names (|names| << |part|, the
    classic dedup-then-join rewrite), and a length-band predicate
    |len(a)-len(b)| <= 2 — a proven lower bound on edit distance —
    prunes candidates before the O(len^2) distance evaluates. At
    100 TB the distinct-name set still fits broadcast; the expensive
    levenshtein only runs inside length bands.
    """
    p = load_table(spark, sf_dir, "part")
    names = p.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    a = names.select(
        F.col("p_name").alias("name_a"), F.col("n_parts").alias("na")
    )
    b = names.select(
        F.col("p_name").alias("name_b"), F.col("n_parts").alias("nb")
    )
    joined = a.join(
        F.broadcast(b),
        (F.col("name_a") < F.col("name_b"))
        & (
            F.abs(F.length("name_a") - F.length("name_b")) <= F.lit(2)
        )
        & (F.levenshtein("name_a", "name_b") <= F.lit(2)),
    )
    return joined.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
        (F.col("na") * F.col("nb")).alias("pair_weight"),
    ).orderBy("dist", "name_a", "name_b")


# ---------------------------------------------------------------------------
# w8 — forward fill (last non-null carry) per user.
# ---------------------------------------------------------------------------
@query(
    "w8_forward_fill",
    oracle="""
    SELECT
      user_id,
      event_id,
      event_type,
      LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        AS last_purchase_value
    FROM events
    ORDER BY user_id, event_id
    """,
)
def w8_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Carry the most recent purchase value forward onto every event.

    The gap-fill staple (sensor/session enrichment): LAST(...,
    ignorenulls) over a running row frame. Values pass through with
    no arithmetic, so the doubles are bit-exact. Scale: partitions by
    user_id — the state per partition is one scalar, and the sort is
    per-user, so AQE splits skewed users only if one user's history
    exceeds a partition (not the case for bounded per-entity
    histories).
    """
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(
        F.when(F.col("event_type") == "purchase", F.col("value")),
        ignorenulls=True,
    ).over(w)
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        carried.alias("last_purchase_value"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# a10 — unpivot / melt.
# ---------------------------------------------------------------------------
@query(
    "a10_unpivot_metrics",
    oracle="""
    WITH m AS (
      SELECT
        o_orderpriority,
        CAST(COUNT(*) AS DOUBLE) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
        CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS n_open
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM m
    UNION ALL
    SELECT o_orderpriority, 'sum_total', sum_total FROM m
    UNION ALL
    SELECT o_orderpriority, 'n_open', n_open FROM m
    ORDER BY o_orderpriority, metric
    """,
)
def a10_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long melt of per-priority order metrics (inverse of the
    a9 pivot). Uses the native ``DataFrame.unpivot`` (Expand under the
    hood — k output rows per input row with NO shuffle), the standard
    reshape for feeding metric-keyed sinks. The aggregate beneath is
    a plain 5-group hash agg; Expand runs on 5 rows.
    """
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_total"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1))
        .cast("double")
        .alias("n_open"),
    )
    return m.unpivot(
        ids=["o_orderpriority"],
        values=["n_orders", "sum_total", "n_open"],
        variableColumnName="metric",
        valueColumnName="value",
    ).orderBy("o_orderpriority", "metric")


# ---------------------------------------------------------------------------
# a11 — argmax aggregation (map-side-combinable "latest row per key").
# ---------------------------------------------------------------------------
@query(
    "a11_latest_order_argmax",
    oracle="""
    SELECT
      o_custkey,
      COUNT(*) AS n_orders,
      arg_max(o_orderkey,
              date_diff('day', TIMESTAMP '1970-01-01 00:00:00', o_orderdate)
                * 100000000 + o_orderkey) AS last_orderkey,
      CAST(arg_max(CAST(o_totalprice AS DECIMAL(18,2)),
              date_diff('day', TIMESTAMP '1970-01-01 00:00:00', o_orderdate)
                * 100000000 + o_orderkey) AS DOUBLE) AS last_totalprice
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
)
def a11_latest_order_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest order per customer via MAX_BY over a unique ordinal.

    The scale-preferred formulation of "top-1 per key": MAX_BY is an
    ordinary aggregate with a partial/final split, so each map task
    forwards ONE candidate row per key — versus the window
    ROW_NUMBER formulation (j13) that shuffles and sorts EVERY row.
    The ordinal packs (days-since-epoch, orderkey) into one BIGINT so
    ties are impossible and the result is deterministic.
    """
    o = load_table(spark, sf_dir, "orders")
    ordinal = (
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).cast(
            "bigint"
        )
        * F.lit(100000000).cast("bigint")
        + F.col("o_orderkey")
    )
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max_by("o_orderkey", ordinal).alias("last_orderkey"),
            F.max_by(F.col("o_totalprice").cast("decimal(18,2)"), ordinal)
            .cast("double")
            .alias("last_totalprice"),
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# hof1 — array higher-order functions over per-order quantity vectors.
# ---------------------------------------------------------------------------
@query(
    "hof1_quantity_array_ops",
    oracle="""
    SELECT
      l_orderkey,
      COUNT(*) AS n_lines,
      COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
      CAST(MAX(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS max_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING COUNT(*) >= 4
    ORDER BY l_orderkey
    """,
)
def hof1_quantity_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order quantity vector analytics via array higher-order
    functions: collect a sorted DECIMAL array, then SIZE / FILTER /
    AGGREGATE (fold) / element_at(-1) — the lambda surface
    (transform/filter/aggregate) the engine exposes for nested data.
    The oracle states the same semantics as flat aggregates; the
    Spark side deliberately exercises the HOF path. The fold runs in
    DECIMAL over an explicitly sorted array, so it is deterministic
    under any partitioning. HOFs evaluate JVM-side inside codegen —
    this is the "stay out of Python" option for nested-array logic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.col("l_quantity").cast("decimal(18,2)"))
        ).alias("qtys")
    )
    return (
        grouped.filter(F.size("qtys") >= 4)
        .select(
            "l_orderkey",
            F.size("qtys").cast("bigint").alias("n_lines"),
            F.expr("CAST(size(filter(qtys, q -> q > 25)) AS BIGINT)").alias(
                "n_big"
            ),
            F.expr(
                "CAST(aggregate(qtys, CAST(0 AS DECIMAL(28,2)),"
                " (acc, q) -> CAST(acc + q AS DECIMAL(28,2))) AS DOUBLE)"
            ).alias("total_qty"),
            F.expr("CAST(element_at(qtys, -1) AS DOUBLE)").alias("max_qty"),
        )
        .orderBy("l_orderkey")
    )


@query(
    "prof3_mad_outliers",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority, o_orderkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    ),
    med AS (
      SELECT o_orderpriority,
             MAX(CASE WHEN rn = CAST(floor((n-1) * 0.5) AS BIGINT) + 1
                      THEN price END) AS med
      FROM r GROUP BY o_orderpriority
    ),
    dev AS (
      SELECT r.o_orderpriority, r.o_orderkey, r.price, m.med,
             abs(r.price - m.med) AS adev,
             ROW_NUMBER() OVER (
               PARTITION BY r.o_orderpriority
               ORDER BY abs(r.price - m.med), r.o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY r.o_orderpriority) AS n
      FROM r JOIN med m ON m.o_orderpriority = r.o_orderpriority
    ),
    mad AS (
      SELECT o_orderpriority,
             MAX(CASE WHEN rn = CAST(floor((n-1) * 0.5) AS BIGINT) + 1
                      THEN adev END) AS mad
      FROM dev GROUP BY o_orderpriority
    )
    SELECT d.o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(MAX(d.med) AS DOUBLE) AS med,
           CAST(MAX(md.mad) AS DOUBLE) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3 * md.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           CAST(SUM(CASE WHEN 2 * d.adev > 3 * md.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mild
    FROM dev d JOIN mad md ON md.o_orderpriority = d.o_orderpriority
    GROUP BY d.o_orderpriority
    """,
)
def prof3_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per order priority: flag orders with
    |price − median| > 3·MAD — the median/MAD rule that survives the
    heavy tails that wreck mean/stddev z-scores (prof2's moments).
    Both the median and the MAD are EXACT element percentiles (t13's
    type-1 pattern, unique-key tie-breaks) computed on decimal(18,2),
    so every comparison is exact decimal arithmetic and the only
    doubles are the output casts.  Two segment-keyed window passes +
    one broadcast-back of the 5-row median/MAD tables; per-segment
    sort is the price of exactness (same lever discussion as t13 —
    shard giant segments or switch to approx_percentile when exact
    isn't the contract)."""
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    w = Window.partitionBy("o_orderpriority").orderBy(price, F.col("o_orderkey"))
    wn = Window.partitionBy("o_orderpriority")
    r = o.select(
        "o_orderpriority",
        "o_orderkey",
        price.alias("price"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    pick = F.floor((F.col("n") - 1) * F.lit(0.5)).cast("bigint") + 1
    med = r.groupBy("o_orderpriority").agg(
        F.max(F.when(F.col("rn") == pick, F.col("price"))).alias("med")
    )
    dev = r.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "o_orderkey",
        "price",
        "med",
        F.abs(F.col("price") - F.col("med")).alias("adev"),
    )
    wd = Window.partitionBy("o_orderpriority").orderBy(
        F.col("adev"), F.col("o_orderkey")
    )
    d2 = dev.select(
        "*",
        F.row_number().over(wd).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    mad = d2.groupBy("o_orderpriority").agg(
        F.max(F.when(F.col("rn") == pick, F.col("adev"))).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.max("med").cast("double").alias("med"),
            F.max("mad").cast("double").alias("mad"),
            F.sum(
                (F.col("adev") > F.lit(3) * F.col("mad")).cast("bigint")
            ).alias("n_outliers"),
            F.sum(
                (F.lit(2) * F.col("adev") > F.lit(3) * F.col("mad")).cast(
                    "bigint"
                )
            ).alias("n_mild"),
        )
    )
