"""Advanced relational + temporal + ANN queries: as-of join, banded
range join, IVF top-k, exact element percentiles, pagination, env-DSL
status mapping (SURVEY.md §2.3 J8), and CUBE grouping sets.

Temporal predicates use exact integer microseconds (``unix_micros`` /
``epoch_us``) so Spark and DuckDB agree bit-for-bit; percentiles pick
actual elements (no interpolation arithmetic to drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from trello_github_etl_spark.io import load_table
from trello_github_etl_spark.operators import asof, similarity
from trello_github_etl_spark.queries.helpers import SQL_DSUM, dsum
from trello_github_etl_spark.queries.llm_q import _sql_cosine
from trello_github_etl_spark.registry import query


# ---------------------------------------------------------------------------
# As-of join (merge as-of via one window pass; oracle = correlated top-1)
# ---------------------------------------------------------------------------
@query(
    "as1_last_view_before_click",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    views AS (
      SELECT event_id, ts, user_id FROM events WHERE event_type = 'view'
    )
    SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
      (SELECT v.event_id FROM views v
        WHERE v.user_id = c.user_id AND v.ts <= c.ts
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS asof_event_id,
      (SELECT v.ts FROM views v
        WHERE v.user_id = c.user_id AND v.ts <= c.ts
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS asof_ts
    FROM clicks c
    """,
)
def as1_last_view_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each click, the latest view at-or-before it by the same user."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "ts", "user_id"
    )
    return asof.asof_join(
        clicks,
        views,
        on="user_id",
        left_ts="click_ts",
        right_ts="ts",
        right_payload=["event_id", "ts"],
        left_tie="click_id",
        right_tie="event_id",
    )


# ---------------------------------------------------------------------------
# Banded range join (interval follow-up stats; oracle = inequality join)
# ---------------------------------------------------------------------------
RANGE_WINDOW_US = 600_000_000  # 10 minutes


@query(
    "rj1_error_followup_stats",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'error'
    ),
    r AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
    )
    SELECT e.event_id AS error_id, e.user_id,
           COUNT(r.event_id) AS n_follow,
           COUNT(CASE WHEN r.event_type = 'click' THEN r.event_id END) AS n_clicks
    FROM e LEFT JOIN r
      ON r.user_id = e.user_id
     AND r.us > e.us AND r.us <= e.us + {RANGE_WINDOW_US}
    GROUP BY 1, 2
    """,
)
def rj1_error_followup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error event: same-user activity in the next 10 minutes."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts"
    )
    joined = asof.banded_range_join(
        errors,
        ev.select("user_id", "ts", "event_id", "event_type"),
        on="user_id",
        window_us=RANGE_WINDOW_US,
    )
    return joined.groupBy("error_id", "user_id").agg(
        F.count("r_event_id").alias("n_follow"),
        F.count(
            F.when(F.col("r_event_type") == "click", F.col("r_event_id"))
        ).alias("n_clicks"),
    )


# ---------------------------------------------------------------------------
# IVF-style ANN (coarse quantize → probe → exact rank within cells)
# ---------------------------------------------------------------------------
def _ivf_oracle() -> str:
    k = similarity.NUM_CENTROIDS
    return f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS c_vec FROM embeddings
      WHERE vec_id < {k}
    ),
    cells AS (
      SELECT vec_id, embedding, cent_id AS cell FROM (
        SELECT t.vec_id, t.embedding, c.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY t.vec_id
                 ORDER BY {_sql_cosine('t.embedding', 'c.c_vec')} DESC,
                          c.cent_id ASC) AS rn
        FROM embeddings t, cents c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT q_id, q_vec, cent_id AS cell FROM (
        SELECT q.vec_id AS q_id, q.embedding AS q_vec, c.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_sql_cosine('q.embedding', 'c.c_vec')} DESC,
                          c.cent_id ASC) AS rn
        FROM embeddings q, cents c WHERE q.vec_id % 100 = 0
      ) WHERE rn <= {similarity.NPROBE}
    ),
    scored AS (
      SELECT p.q_id, t.vec_id,
             {_sql_cosine('p.q_vec', 't.embedding')} AS cos
      FROM cells t JOIN probes p ON t.cell = p.cell
    )
    SELECT q_id, vec_id, cos, rank FROM (
      SELECT q_id, vec_id, cos,
             ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """


@query("s4_ivf_topk", oracle=_ivf_oracle())
def s4_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via IVF cells (centroids = first NUM_CENTROIDS vectors)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = emb.filter(F.col("vec_id") < similarity.NUM_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    qs = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return similarity.ivf_topk(qs, emb, cents, cache_key=f"ivf16|{sf_dir}")


IVF_NPROBE_MAX = 4
IVF_BUDGET = 150


def _ivf_budgeted_oracle() -> str:
    k = similarity.NUM_CENTROIDS
    return f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS c_vec FROM embeddings
      WHERE vec_id < {k}
    ),
    cells AS (
      SELECT vec_id, embedding, cent_id AS cell FROM (
        SELECT t.vec_id, t.embedding, c.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY t.vec_id
                 ORDER BY {_sql_cosine('t.embedding', 'c.c_vec')} DESC,
                          c.cent_id ASC) AS rn
        FROM embeddings t, cents c
      ) WHERE rn = 1
    ),
    occ AS (SELECT cell, COUNT(*) AS occ FROM cells GROUP BY cell),
    probes0 AS (
      SELECT q_id, q_vec, cent_id AS cell, crank FROM (
        SELECT q.vec_id AS q_id, q.embedding AS q_vec, c.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_sql_cosine('q.embedding', 'c.c_vec')} DESC,
                          c.cent_id ASC) AS crank
        FROM embeddings q, cents c WHERE q.vec_id % 100 = 0
      ) WHERE crank <= {IVF_NPROBE_MAX}
    ),
    probes AS (
      SELECT q_id, q_vec, cell FROM (
        SELECT p.*,
               SUM(COALESCE(o.occ, 0)) OVER (
                 PARTITION BY p.q_id ORDER BY p.crank
                 ROWS UNBOUNDED PRECEDING) - COALESCE(o.occ, 0) AS cum_before
        FROM probes0 p LEFT JOIN occ o USING (cell)
      ) WHERE cum_before < {IVF_BUDGET}
    ),
    scored AS (
      SELECT p.q_id, t.vec_id,
             {_sql_cosine('p.q_vec', 't.embedding')} AS cos
      FROM cells t JOIN probes p ON t.cell = p.cell
    )
    SELECT q_id, vec_id, cos, rank FROM (
      SELECT q_id, vec_id, cos,
             ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """


@query("s6_ivf_budgeted_topk", oracle=_ivf_budgeted_oracle())
def s6_ivf_budgeted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 via budget-adaptive IVF multi-probe: cells probed in
    centroid-distance order until their combined occupancy reaches the
    candidate budget (max 4 probes) — dense regions probe few cells,
    sparse regions probe more, bounding scored candidates per query."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = emb.filter(F.col("vec_id") < similarity.NUM_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    qs = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return similarity.ivf_topk_budgeted(
        qs,
        emb,
        cents,
        nprobe_max=IVF_NPROBE_MAX,
        candidate_budget=IVF_BUDGET,
        cache_key=f"ivf16|{sf_dir}",
    )


# ---------------------------------------------------------------------------
# Exact element percentiles (no interpolation → FP-exact on both sides)
# ---------------------------------------------------------------------------
@query(
    "pct1_price_percentiles",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority, MAX(n) AS n_orders,
      MAX(CASE WHEN rn = CAST(floor((n-1) * 0.5) AS BIGINT) + 1
               THEN o_totalprice END) AS p50,
      MAX(CASE WHEN rn = CAST(floor((n-1) * 0.9) AS BIGINT) + 1
               THEN o_totalprice END) AS p90
    FROM r GROUP BY o_orderpriority
    """,
)
def pct1_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element percentile (type-1): the value at index floor((n-1)·p).

    Picks an actual data element via row_number against a window
    count — deterministic (unique o_orderkey tie-break) and free of
    interpolation arithmetic, so the doubles hash-match the oracle.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    r = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )

    def at(p: float) -> F.Column:
        idx = F.floor((F.col("n") - 1) * p) + 1
        return F.max(F.when(F.col("rn") == idx, F.col("o_totalprice")))

    return r.groupBy("o_orderpriority").agg(
        F.max("n").alias("n_orders"),
        at(0.5).alias("p50"),
        at(0.9).alias("p90"),
    )


# ---------------------------------------------------------------------------
# Pagination (O5: slice window, SURVEY.md §2.5)
# ---------------------------------------------------------------------------
@query(
    "o5_orders_page",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
    ORDER BY o_orderdate, o_orderkey
    LIMIT 20 OFFSET 100
    """,
)
def o5_orders_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET page over a total order (unique-key tie-break)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
        .offset(100)
        .limit(20)
    )


# ---------------------------------------------------------------------------
# J8: env-DSL status mapping applied as a map-literal join
# ---------------------------------------------------------------------------
STATUS_DSL = "O:Open, F:Fulfilled, P:Pending"


@query(
    "j8_status_map_rollup",
    oracle=f"""
    SELECT
      CASE o_orderstatus
        WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Fulfilled'
        WHEN 'P' THEN 'Pending' ELSE '!Status' END AS status_label,
      COUNT(*) AS n_orders,
      {SQL_DSUM.format(col='o_totalprice')} AS revenue
    FROM orders GROUP BY 1
    """,
)
def j8_status_map_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's GITHUB_PROJECT_BOARD_LISTS DSL (lib/transform.js:
    86–97) as str_to_map → element_at lookup with a '!Status' sentinel
    (F15), rolled up per mapped label."""
    orders = load_table(spark, sf_dir, "orders")
    dsl_map = F.expr(f"str_to_map('{STATUS_DSL}', '[,\\\\s]+', ':')")
    return (
        orders.withColumn(
            "status_label",
            F.coalesce(
                F.element_at(dsl_map, F.col("o_orderstatus")), F.lit("!Status")
            ),
        )
        .groupBy("status_label")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# CUBE grouping sets (SURVEY.md §2.4 stretch surface)
# ---------------------------------------------------------------------------
@query(
    "a7_priority_status_cube",
    oracle="""
    SELECT
      COALESCE(o_orderpriority, 'ALL') AS priority,
      COALESCE(o_orderstatus, 'ALL') AS status,
      COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def a7_priority_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with sentinel-coalesced keys (both keys non-null in data)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("revenue"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
            "revenue",
        )
    )


# ---------------------------------------------------------------------------
# k-means refinement of the IVF coarse quantizer (fixed-point means)
# ---------------------------------------------------------------------------
def _kmeans_ctes(n_iter: int = 2) -> str:
    """CTE chain cents0..cents{n_iter} (shared by s9 and s10)."""
    k = similarity.NUM_CENTROIDS
    fix = "1000000000.0"
    sql_dot = (
        "list_reduce(list_transform(list_zip(t.embedding, c.c_vec),"
        " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
    )
    sql_cn = (
        "sqrt(list_reduce(list_transform(c.c_vec,"
        " v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))"
    )
    ctes = [
        f"""cents0 AS (
      SELECT vec_id AS cent_id, embedding AS c_vec FROM embeddings
      WHERE vec_id < {k}
    )"""
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""assign{i} AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT t.vec_id, t.embedding, c.cent_id AS cell,
               ROW_NUMBER() OVER (
                 PARTITION BY t.vec_id
                 ORDER BY {sql_dot} / {sql_cn} DESC, c.cent_id ASC) AS rn
        FROM embeddings t, cents{i - 1} c
      ) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""sums{i} AS (
      SELECT cell, pos,
             SUM(floor(CAST(embedding[pos] AS DOUBLE) * {fix})) AS s,
             COUNT(*) AS n
      FROM (
        SELECT cell, embedding,
               unnest(generate_series(1, len(embedding))) AS pos
        FROM assign{i}
      ) GROUP BY cell, pos
    )"""
        )
        ctes.append(
            f"""cents{i} AS (
      SELECT cell AS cent_id, MAX(n) AS n_members,
             list((CAST(s AS DOUBLE) / {fix}) / n ORDER BY pos) AS c_vec
      FROM sums{i} GROUP BY cell
    )"""
        )
    return "WITH " + ",\n    ".join(ctes)


def _kmeans_oracle(n_iter: int = 2) -> str:
    # One row per (centroid, dimension): sums{n} already carries the
    # per-dimension fixed-point sum, so the final mean is recomputed
    # with the identical double arithmetic as the Spark side. Row
    # form (not a list column) keeps the output driver-hashable.
    fix = "1000000000.0"
    return (
        _kmeans_ctes(n_iter)
        + f"""
    SELECT cell AS cent_id, n AS n_members, pos,
           (CAST(s AS DOUBLE) / {fix}) / n AS val
    FROM sums{n_iter}"""
    )


@query("s9_kmeans_refine", oracle=_kmeans_oracle())
def s9_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd rounds refining the 16 seed centroids, with
    bit-reproducible fixed-point mean accumulation (the operator doc
    on similarity.kmeans_refine explains why the 1e-9 grid makes the
    distributed sum partitioning-invariant — which is also exactly
    what lets a DuckDB oracle check an iterative float algorithm).
    The centroid vector is exploded to (cent_id, n_members, pos, val)
    rows — 1-based pos to match the oracle's generate_series — so the
    output has no array column for the driver to choke on."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = emb.filter(F.col("vec_id") < similarity.NUM_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    refined = similarity.kmeans_refine(emb, cents, n_iter=2)
    return refined.select(
        "cent_id",
        "n_members",
        F.posexplode("c_vec").alias("pos", "val"),
    ).withColumn("pos", (F.col("pos") + F.lit(1)).cast("long"))


def _trained_ivf_oracle() -> str:
    return (
        _kmeans_ctes(2)
        + f""",
    tcents AS (SELECT cent_id, c_vec FROM cents2),
    cells AS (
      SELECT vec_id, embedding, cent_id AS cell FROM (
        SELECT t.vec_id, t.embedding, c.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY t.vec_id
                 ORDER BY {_sql_cosine('t.embedding', 'c.c_vec')} DESC,
                          c.cent_id ASC) AS rn
        FROM embeddings t, tcents c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT q_id, q_vec, cent_id AS cell FROM (
        SELECT q.vec_id AS q_id, q.embedding AS q_vec, c.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_sql_cosine('q.embedding', 'c.c_vec')} DESC,
                          c.cent_id ASC) AS rn
        FROM embeddings q, tcents c WHERE q.vec_id % 100 = 0
      ) WHERE rn <= {similarity.NPROBE}
    ),
    scored AS (
      SELECT p.q_id, t.vec_id,
             {_sql_cosine('p.q_vec', 't.embedding')} AS cos
      FROM cells t JOIN probes p ON t.cell = p.cell
    )
    SELECT q_id, vec_id, cos, rank FROM (
      SELECT q_id, vec_id, cos,
             ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """
    )


@query("s10_ivf_trained_topk", oracle=_trained_ivf_oracle())
def s10_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ANN lifecycle in one declarative plan: train the
    coarse quantizer (two fixed-point Lloyd rounds), re-index the
    corpus against the refined centroids, probe-and-rank exactly
    within cells. Refined cells track the data distribution, so cell
    occupancy balances and recall per probed candidate improves vs
    the seed quantizer of s4 — this is what an IVF build actually
    runs before serving."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    seed = emb.filter(F.col("vec_id") < similarity.NUM_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    # inplan_pack=False (r15): ivf_topk COLLECTS the refined
    # centroids to build the serve plan, so the scalar-subquery fold
    # only moves work between two driver actions and re-plans the
    # full 2-round chain — measured +0.40 s median at sf0.1 (operator
    # docstring has the A/B); the collect+literal path stays optimal
    # exactly here.
    trained = similarity.kmeans_refine(
        emb, seed, n_iter=2, inplan_pack=False
    ).select("cent_id", "c_vec")
    qs = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return similarity.ivf_topk(qs, emb, trained)


@query(
    "as2_next_purchase_after_signup",
    oracle="""
    WITH signups AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'
    ),
    purchases AS (
      SELECT event_id, ts, value, user_id FROM events
      WHERE event_type = 'purchase'
    )
    SELECT s.event_id AS signup_id, s.user_id, s.ts AS signup_ts,
      (SELECT p.event_id FROM purchases p
        WHERE p.user_id = s.user_id AND p.ts >= s.ts
        ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS asof_event_id,
      (SELECT p.value FROM purchases p
        WHERE p.user_id = s.user_id AND p.ts >= s.ts
        ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS asof_value
    FROM signups s
    """,
)
def as2_next_purchase_after_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for each signup, the EARLIEST purchase at-or-
    after it by the same user (time-to-conversion joins). Same
    single-shuffle merge construction as as1, mirrored — see
    operators/asof.py:asof_join_forward. The oracle's correlated
    LIMIT-1 subquery is the O(n·m) formulation this operator replaces
    at scale."""
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("signup_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "value", "user_id"
    )
    return asof.asof_join_forward(
        signups,
        purchases,
        on="user_id",
        left_ts="signup_ts",
        right_ts="ts",
        right_payload=["event_id", "value"],
        right_tie="event_id",
    )


@query(
    "o7_keyset_page",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
    WHERE o_orderdate > TIMESTAMP '1997-06-01 00:00:00'
       OR (o_orderdate = TIMESTAMP '1997-06-01 00:00:00'
           AND o_orderkey > 5000)
    ORDER BY o_orderdate, o_orderkey
    LIMIT 20
    """,
)
def o7_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination: resume after the last-seen
    (o_orderdate, o_orderkey) cursor instead of OFFSET.

    The scale-correct pager: OFFSET n (o5) must produce and discard n
    rows on every page — page p costs O(p); the keyset predicate is
    sargable, reaches the parquet scan as a min/max-prunable filter
    (row groups entirely before the cursor are skipped), and every
    page costs the same. TopK sort (limit 20) never materializes a
    global sort.
    """
    cursor_date, cursor_key = "1997-06-01 00:00:00", 5000
    o = load_table(spark, sf_dir, "orders")
    after = (F.col("o_orderdate") > F.lit(cursor_date).cast("timestamp")) | (
        (F.col("o_orderdate") == F.lit(cursor_date).cast("timestamp"))
        & (F.col("o_orderkey") > F.lit(cursor_key))
    )
    return (
        o.select("o_orderkey", "o_orderdate", "o_totalprice")
        .filter(after)
        .orderBy("o_orderdate", "o_orderkey")
        .limit(20)
    )


from trello_github_etl_spark.operators import zorder as _zorder

# Shared normalization: both keys onto 10-bit grids with fixed stats
# (o_custkey in [0, 15000) at sf<=0.1; order day in [0, 2404)).
_ZNORM = (
    "SELECT o_orderkey, "
    "  CAST(FLOOR((o_custkey * 1023) / 15000) AS BIGINT) AS zx, "
    "  CAST(FLOOR((date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)"
    "        * 1023) / 2404) AS BIGINT) AS zy "
    "FROM orders"
)


@query(
    "zo1_zorder_key",
    oracle=f"""
    SELECT o_orderkey, zx, zy,
           {_zorder.zvalue_sql(['zx', 'zy'], bits=10)} AS zval
    FROM ({_ZNORM})
    ORDER BY zval, o_orderkey
    LIMIT 500
    """,
)
def zo1_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (z-order) clustering key over (customer, order-day):
    the multi-dimensional layout key for data skipping
    (operators/zorder.py). The interleave is %-and-* integer
    arithmetic generated once and shared verbatim with the oracle.
    Row-group pruning effectiveness of the layout is verified in
    tests/test_zorder.py by counting overlapping row groups against
    a single-column sort."""
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(
        F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
    ).cast("bigint")
    normed = o.select(
        "o_orderkey",
        F.floor((F.col("o_custkey") * 1023) / 15000).cast("bigint").alias("zx"),
        F.floor((day * 1023) / 2404).cast("bigint").alias("zy"),
    )
    return (
        normed.select(
            "o_orderkey", "zx", "zy",
            _zorder.zvalue(["zx", "zy"], bits=10).alias("zval"),
        )
        .orderBy("zval", "o_orderkey")
        .limit(500)
    )
