"""Table maintenance: small-file compaction.

Streaming sinks, incremental loads, and per-partition writers leave
tables as thousands of KB-sized files; at 100 TB that turns every
scan into a file-listing + task-scheduling problem (one task per
file, seconds of overhead each) and wrecks row-group statistics.
Compaction rewrites a table into size-targeted files while
PRESERVING the clustering that makes pruning work — it must not undo
a z-order/sort layout (operators/zorder.py), so the rewrite
range-partitions on the existing layout key rather than coalescing
arbitrarily.

The reference never needs this (one board, one JSON file); it is the
operational half of the layout story, same as OPTIMIZE in lakehouse
systems. Rewrite-then-swap: write to a new directory and atomically
repoint readers (the state store's manifest pattern,
plans/state_store.py) — never rewrite in place.

Scale: one range-exchange over the table, the same cost as the
original sorted write; file count drops from O(batches × partitions)
to ceil(rows / target).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession


def plan_compaction(
    spark: SparkSession, path: str, target_rows_per_file: int
) -> tuple[DataFrame, int]:
    """(table, n_output_files) for a compaction rewrite."""
    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    return df, n_files


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    layout_key: Column | str,
    target_rows_per_file: int,
) -> int:
    """Rewrite ``path`` into ``out_path`` as ~equal-sized files
    range-partitioned and sorted on ``layout_key`` (the table's
    existing clustering column). Returns the number of output files.
    """
    df, n_files = plan_compaction(spark, path, target_rows_per_file)
    (
        df.repartitionByRange(n_files, layout_key)
        .sortWithinPartitions(layout_key)
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return n_files
