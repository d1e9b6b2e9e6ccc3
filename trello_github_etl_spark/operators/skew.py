"""Skew mitigation: salted two-phase aggregation and salted
replicated joins.

AQE's skew-join splitting (enabled in session.py) handles skew it can
*see* at shuffle-read time; salting is the explicit plan-shape fix for
known-hot keys — low-cardinality group-bys and fact⋈dim joins where
one key owns a large share of rows (at 100 TB, a 5-value key column
means billions of rows per reducer without it).

Determinism contract: salts derive from ``xxhash64`` of a unique data
column (no RNG, no partition id), and phase-1 partials use exact
DECIMAL sums — so re-aggregation is bit-identical to the unsalted
plan and DuckDB oracles the final result directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trello_github_etl_spark.queries.helpers import DEC

DEFAULT_BUCKETS = 32


def salt_col(unique_col: str | Column, buckets: int = DEFAULT_BUCKETS) -> Column:
    """Uniform deterministic salt in [0, buckets): xxhash64 % buckets."""
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.xxhash64(c), F.lit(buckets))


def salted_count_sum(
    df: DataFrame,
    key: str,
    value_col: str,
    unique_col: str,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """count(*) + exact sum(value) per key, salted into two phases.

    Phase 1 shuffles on (key, salt) — ``buckets``× the reducer
    parallelism of the hot keys; phase 2 re-aggregates ``buckets``
    partial rows per key (trivial). Decimal partial sums make the
    two-phase result exactly equal to the one-phase plan.
    """
    p1 = (
        df.withColumn("_salt", salt_col(unique_col, buckets))
        .groupBy(key, "_salt")
        .agg(
            F.count("*").alias("_n"),
            F.sum(F.col(value_col).cast(DEC)).alias("_s"),
        )
    )
    return p1.groupBy(key).agg(
        F.sum("_n").alias("n"),
        F.sum("_s").cast("double").alias("sum_value"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_unique_col: str,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Inner equi-join with the dim side replicated ``buckets``× and
    the fact side salted — every reducer gets ~1/buckets of each hot
    key instead of one reducer getting all of it.

    For a truly tiny dim, ``F.broadcast`` is strictly better (no
    shuffle at all); salting is the tool when the dim is too big to
    broadcast but the fact key is skewed.
    """
    dim_rep = dim.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i).cast("long") for i in range(buckets)])),
    )
    fact_s = fact.withColumn("_salt", salt_col(fact_unique_col, buckets))
    return fact_s.join(dim_rep, [key, "_salt"]).drop("_salt")
