"""Skew-mitigation queries: the salted plans must produce results
bit-identical to the plain single-phase SQL the oracle runs — that IS
the point (salting changes the physical shape, never the answer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trello_github_etl_spark.io import load_table
from trello_github_etl_spark.operators import skew
from trello_github_etl_spark.registry import query


@query(
    "skew1_salted_event_rollup",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def skew1_salted_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-value key → every reducer hot. Two-phase salted agg: phase 1
    shuffles on (event_type, xxhash64(event_id)%32), phase 2 folds the
    32 exact-decimal partials per key."""
    ev = load_table(spark, sf_dir, "events")
    return skew.salted_count_sum(
        ev, key="event_type", value_col="value", unique_col="event_id"
    )


@query(
    "skew2_salted_join_rollup",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT event_type, upper(event_type) AS type_label
      FROM events
    )
    SELECT d.type_label, COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e JOIN dim d ON d.event_type = e.event_type
    GROUP BY d.type_label
    """,
)
def skew2_salted_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join on the skewed key: dim replicated 32×,
    fact salted, then rolled up. (At this dim size broadcast wins —
    the query exists to pin the salted plan's exactness.)"""
    ev = load_table(spark, sf_dir, "events")
    dim = ev.select("event_type").distinct().withColumn(
        "type_label", F.upper("event_type")
    )
    joined = skew.salted_join(
        ev, dim, key="event_type", fact_unique_col="event_id"
    )
    return joined.groupBy("type_label").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(skew.DEC)).cast("double").alias("sum_value"),
    )


def _bloom_oracle() -> str:
    from trello_github_etl_spark.operators import bloom as B

    def h(i: int, key: str) -> str:
        return (
            "CAST(TRY_CAST('0x' || substr(md5('"
            + f"{i}|' || CAST({key} AS VARCHAR)), 1, 15) AS UBIGINT) AS BIGINT)"
            + f" % {B.NUM_BITS}"
        )

    bpw = B.BITS_PER_WORD
    hits = " AND ".join(f"h{i}" for i in range(B.BLOOM_K))
    hit_cols = ",\n             ".join(
        f"COALESCE(((b{i}.word >> CAST(p.p{i} % {bpw} AS INT)) % 2) = 1,"
        f" FALSE) AS h{i}"
        for i in range(B.BLOOM_K)
    )
    joins = "\n      ".join(
        f"LEFT JOIN bloom b{i} ON CAST(p.p{i} // {bpw} AS INT) = b{i}.word_idx"
        for i in range(B.BLOOM_K)
    )
    pos_list = ", ".join(h(i, "c_custkey") for i in range(B.BLOOM_K))
    probe_pos = ", ".join(
        f"{h(i, 'o_custkey')} AS p{i}" for i in range(B.BLOOM_K)
    )
    return f"""
    WITH keys AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    pos AS (SELECT unnest([{pos_list}]) AS pos FROM keys),
    bloom AS (
      SELECT CAST(pos // {bpw} AS INT) AS word_idx,
             bit_or(1::BIGINT << CAST(pos % {bpw} AS INT)) AS word
      FROM pos GROUP BY 1
    ),
    probed AS (
      SELECT p.o_custkey, {hits.replace(' AND ', ' AND ').replace('h0', 'h0')}
             AS pass_all
      FROM (
        SELECT o_orderkey, o_custkey, {probe_pos} FROM orders
      ) p
      {joins}
      CROSS JOIN LATERAL (SELECT {hit_cols}) hc
    )
    SELECT COUNT(*) AS n_orders,
           COUNT(CASE WHEN pass_all THEN 1 END) AS n_pass,
           COUNT(CASE WHEN t.c_custkey IS NOT NULL THEN 1 END) AS n_true,
           COUNT(CASE WHEN pass_all AND t.c_custkey IS NULL THEN 1 END)
             AS n_false_pass
    FROM probed LEFT JOIN keys t ON probed.o_custkey = t.c_custkey
    """


@query("bloom1_runtime_filter", oracle=_bloom_oracle())
def bloom1_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom pruning measured end-to-end: build the filter
    over BUILDING-segment customers (one bit_or aggregate), probe
    every order in a broadcast narrow pass, and score the filter —
    passes vs true semi-join matches vs false positives. The
    false-positive count is itself deterministic (md5-derived bit
    positions), which is what makes a sketch oracle-checkable."""
    from trello_github_etl_spark.operators import bloom as B

    keys = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    bloom_words = B.build_bloom(keys, "c_custkey")
    probed = B.probe_bloom(orders, bloom_words, "o_custkey")
    truth = keys.select(F.col("c_custkey").alias("_tk"))
    flagged = probed.join(
        truth, probed["o_custkey"] == truth["_tk"], "left"
    )
    return flagged.agg(
        F.count("*").alias("n_orders"),
        F.count(F.when(F.col("bloom_pass"), 1)).alias("n_pass"),
        F.count(F.when(F.col("_tk").isNotNull(), 1)).alias("n_true"),
        F.count(
            F.when(F.col("bloom_pass") & F.col("_tk").isNull(), 1)
        ).alias("n_false_pass"),
    )
