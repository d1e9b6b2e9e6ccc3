"""Driver-checkable owner-resolution queries (SURVEY.md §2.3 J6/J7).

The board-domain operator runs here on testdata-constructed inputs:
per-order "member" arrays built from lineitem suppliers, fallback
text derived from the order key. The fallback strings are plain
alphanumerics, so the reference's regex-match semantics reduce to
substring containment — which DuckDB can oracle exactly, including
the dim-rescue path (FIXTURES.md §C owner case matrix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trello_github_etl_spark.io import load_table
from trello_github_etl_spark.operators.owners import (
    fuzzy_username_to_id,
    resolve_owners,
    with_owner_sentinels,
)
from trello_github_etl_spark.registry import query


@query(
    "j7_owner_resolution",
    oracle="""
    WITH m AS (
      SELECT
        l_orderkey,
        l_linenumber AS pos,
        l_suppkey,
        'Supp' || CAST(l_suppkey AS VARCHAR) AS member
      FROM lineitem
      WHERE l_orderkey % 25 = 0 AND l_linenumber <= 4
    ),
    rf AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0
                  THEN 'supp' || CAST(o_orderkey % 120 AS VARCHAR)
             END AS raw_fallback
      FROM orders WHERE o_orderkey % 25 = 0
    ),
    base AS (
      SELECT m.*, rf.raw_fallback
      FROM m JOIN rf ON rf.o_orderkey = m.l_orderkey
    ),
    owner_pick AS (
      SELECT l_orderkey,
             FIRST(member ORDER BY pos, l_suppkey)
               FILTER (WHERE raw_fallback IS NULL
                       OR NOT CONTAINS(LOWER(member), LOWER(raw_fallback)))
               AS owner,
             ANY_VALUE(raw_fallback) AS raw_fallback
      FROM base GROUP BY l_orderkey
    ),
    fb_pick AS (
      SELECT b.l_orderkey,
             FIRST(b.member ORDER BY b.pos, b.l_suppkey)
               FILTER (WHERE o.raw_fallback IS NOT NULL
                       AND (o.owner IS NULL OR LOWER(b.member) != LOWER(o.owner))
                       AND CONTAINS(LOWER(b.member), LOWER(o.raw_fallback)))
               AS fb_sub
      FROM base b JOIN owner_pick o ON o.l_orderkey = b.l_orderkey
      GROUP BY b.l_orderkey
    ),
    rescue AS (
      SELECT LOWER('Supp' || CAST(s_suppkey AS VARCHAR)) AS k,
             'Supp' || CAST(s_suppkey AS VARCHAR) AS uname
      FROM supplier
    )
    SELECT
      o.l_orderkey AS order_key,
      COALESCE(NULLIF(o.owner, ''), '!Owner') AS owner,
      COALESCE(NULLIF(COALESCE(f.fb_sub, r.uname), ''), '!Fallback') AS fallback_owner
    FROM owner_pick o
    JOIN fb_pick f ON f.l_orderkey = o.l_orderkey
    LEFT JOIN rescue r
      ON f.fb_sub IS NULL AND o.raw_fallback IS NOT NULL
         AND LOWER(o.raw_fallback) = r.k
    """,
)
def j7_owner_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resolve_owners over per-order member arrays + supplier-dim rescue."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") % 25 == 0) & (F.col("l_linenumber") <= 4)
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 25 == 0)

    members = (
        li.select(
            "l_orderkey",
            F.struct(
                F.col("l_linenumber").alias("pos"),
                F.col("l_suppkey").alias("sk"),
                F.concat(F.lit("Supp"), F.col("l_suppkey").cast("string")).alias("m"),
            ).alias("s"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.transform(
                F.sort_array(F.collect_list("s")), lambda s: s["m"]
            ).alias("member_usernames")
        )
    )
    cards = members.join(
        orders, members.l_orderkey == orders.o_orderkey
    ).select(
        "l_orderkey",
        "member_usernames",
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.concat(F.lit("supp"), (F.col("o_orderkey") % 120).cast("string")),
        ).alias("raw_fallback"),
    )

    dim = load_table(spark, sf_dir, "supplier").select(
        F.concat(F.lit("Supp"), F.col("s_suppkey").cast("string")).alias("username")
    )
    resolved = with_owner_sentinels(resolve_owners(cards, dim))
    return resolved.select(
        F.col("l_orderkey").alias("order_key"), "owner", "fallback_owner"
    )


@query(
    "j6b_fuzzy_username_lookup",
    oracle="""
    WITH q AS (
      SELECT DISTINCT '@Supp' || CAST(c_custkey % 150 AS VARCHAR) AS query_username
      FROM customer WHERE c_custkey % 11 = 0
    ),
    dim AS (
      SELECT s_suppkey, 'supp' || CAST(s_suppkey AS VARCHAR) || 'x' AS username
      FROM supplier
    )
    SELECT
      q.query_username,
      (SELECT MIN(d.s_suppkey) FROM dim d
        WHERE CONTAINS(LOWER(d.username),
                       LOWER(regexp_replace(q.query_username, '^@', '')))
          AND d.s_suppkey = (
            SELECT MIN(d2.s_suppkey) FROM dim d2
            WHERE CONTAINS(LOWER(d2.username),
                           LOWER(regexp_replace(q.query_username, '^@', ''))))
      ) AS member_id
    FROM q
    """,
)
def j6b_fuzzy_username_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match fuzzy lookup: '@Supp7' finds supplier 'supp7x'."""
    qs = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 11 == 0)
        .select(
            F.concat(
                F.lit("@Supp"), (F.col("c_custkey") % 150).cast("string")
            ).alias("query_username")
        )
        .distinct()
    )
    dim = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"),
        F.concat(
            F.lit("supp"), F.col("s_suppkey").cast("string"), F.lit("x")
        ).alias("username"),
        F.col("s_suppkey"),
    )
    out = fuzzy_username_to_id(qs, dim, order_col="s_suppkey")
    return out.select("query_username", F.col("member_id"))
