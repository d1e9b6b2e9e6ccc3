"""Parquet table catalog for the driver testdata.

``load_tables`` hands back a dict of DataFrames; each read is a plain
``spark.read.parquet`` so Catalyst keeps predicate pushdown, column
pruning and partition pruning on the scan. Never materializes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that should always end up on the broadcast side of
# a join (region=5 rows, nation=25 even at sf100).
BROADCAST_DIMS = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    # The driver hands queries ITS OWN SparkSession, which may lack
    # session.py's defaults; self-provision the two CORRECTNESS-
    # relevant confs here (runtime-settable, idempotent). TZ first:
    # queries surface raw TIMESTAMPs (as-of join) and cast NTZ↔TS
    # (window frames, date literals) — a non-UTC host session would
    # shift those relative to the oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        try:
            df = spark.read.parquet(table_path(sf_dir, name))
        except Exception as e:
            # Only the nanos-timestamp rejection earns the retry; any
            # other failure (missing path, corrupt file) must re-raise
            # untouched so a session-wide legacy conf is never flipped
            # by an unrelated error.
            msg = str(e)
            if not (
                "Illegal Parquet type" in msg
                or "PARQUET_TYPE_ILLEGAL" in msg
                or "TIMESTAMP(NANOS" in msg
            ):
                raise
            # Older testdata ships events.ts as parquet
            # TIMESTAMP(NANOS), which the vectorized reader rejects
            # outright (PARQUET_TYPE_ILLEGAL) unless nanosAsLong is
            # on. The data is µs-precision, so the micros conversion
            # is exact (verified: epoch_ns % 1000 == 0).
            # SESSION-WIDE SIDE EFFECT (deliberate): the conf must
            # stay set until the scan executes — Spark re-reads it
            # when the physical plan is built, so restoring it here
            # would break the deferred scan. Only nanos-encoded
            # testdata takes this branch; µs-encoded files never
            # flip the conf.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(table_path(sf_dir, name))
    else:
        df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import (
            LongType,
            TimestampNTZType,
            TimestampType,
        )

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # integer division — float division of epoch-nanos exceeds
            # double precision (53 bits) and lands ±1 µs off
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            # Newer testdata is TIMESTAMP(MICROS, isAdjustedToUTC=false)
            # → Spark infers TIMESTAMP_NTZ. Engine contract is
            # TimestampType; with the session TZ pinned to UTC above,
            # the NTZ→LTZ cast preserves every wall-clock field, so
            # oracle comparisons are unchanged. Cast to the explicit
            # DataType instance — the "timestamp" keyword resolves via
            # spark.sql.timestampType, and a host session configured
            # with TIMESTAMP_NTZ would silently no-op the cast.
            df = df.withColumn("ts", F.col("ts").cast(TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view for spark.sql() queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet layout: filters on the partition
    columns prune directories at plan time (PartitionFilters in the
    scan), so a day-filter over a year of data reads 1/365th of it."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)
