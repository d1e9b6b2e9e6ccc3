"""Bucketed (co-located) tables: pre-shuffle once at write time so
every later equi-join/aggregation on the bucket key runs shuffle-free.

At 100 TB the fact⋈fact shuffle IS the job cost; bucketing both fact
tables by the join key at ingest amortizes that shuffle across every
downstream query (Spark reads bucket i of both sides into the same
task — a zipped scan, no exchange). The write itself clusters by
``hash(key) % num_buckets`` and sorts within buckets, so bucket joins
can also skip the sort of a sort-merge join.

Sizing rule: buckets ≈ total_size / target_partition_size (e.g.
100 TB / 256 MB ≈ 400k buckets is too many files per write — in
practice bucket the *pruned* working set or combine with date
partitioning: ``partitionBy(day).bucketBy(k, key)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    path: str | None = None,
) -> None:
    """Save ``df`` as a bucketed+sorted table on ``key``.

    ``path`` makes it an external table (tests point this at a tmp
    dir); omitted, it lands in the session warehouse.
    """
    w = df.write.bucketBy(num_buckets, key).sortBy(key).mode("overwrite")
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join two same-bucket-count tables on their bucket key —
    plans with zero Exchange (verify with .explain()).

    The MERGE hint pins the sort-merge path: that is the plan shape a
    fact⋈fact join takes at scale anyway, and with small test inputs
    the planner would otherwise pick broadcast and bypass bucketing
    entirely (the scan says "Bucketed: false, disabled by query
    planner")."""
    return (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table), key)
    )
