"""As-of and range joins — ordered-temporal operators the reference
lacks (SURVEY.md §2.3 notes their absence: "sort-merge/range/as-of/
interval joins: absent") but any event pipeline needs. Both are built
to avoid per-row range scans at scale:

- ``asof_join``: union the two sides and make one window pass per
  key — the classic "merge as-of" as a SINGLE shuffle on the join key.
  No inequality join, no candidate explosion; the running
  ``last(..., ignoreNulls)`` over an UnboundedPreceding→CurrentRow
  frame is O(1) state per row.
- ``banded_range_join``: bucket the time axis at the window width so
  the inequality join becomes an equi-join on (key, bucket) with a
  residual filter. Each left row probes exactly 2 buckets, so
  candidates are bounded by band occupancy — never |L|×|R|. Bucket
  math is exact integer µs (``unix_micros``), reproducible in any
  engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    left_tie: str | None = None,
    right_tie: str | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join: for each left row, the single
    right row with the greatest ``right_ts <= left_ts`` in the same
    ``on`` group (ties on right_ts broken by greatest ``right_tie``).

    Matched payload columns come back null when no right row precedes
    the left row (left-outer as-of semantics).
    """
    right_payload = right_payload or [c for c in right.columns if c != on]
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ats"),
        (F.col(right_tie) if right_tie else F.lit(0)).alias("_tie"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_rpay"),
        F.lit(0).alias("_side"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_ats"),
        (F.col(left_tie) if left_tie else F.lit(0)).alias("_tie"),
        F.lit(1).alias("_side"),
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    # Right rows sort before left rows at equal ts (_side 0 < 1) →
    # inclusive match; among right rows the last is (max ts, max tie).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ats"), F.col("_side"), F.col("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = merged.withColumn(
        "_match", F.last("_rpay", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    out = matched.select(
        *[F.col(c) for c in left.columns],
        *[F.col("_match")[c].alias(f"asof_{c}") for c in right_payload],
    )
    return out


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    window_us: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Candidate pairs where ``left_ts < right_ts <= left_ts + window_us``
    (µs) in the same ``on`` group, as an equi-join.

    Left rows probe their bucket and the next one (a window of width W
    spans at most two W-wide buckets); right rows carry one bucket. A
    right row can match at most one probe of a given left row, so a
    follow-up aggregation needs no dedup. Returns the joined frame
    (left-outer, so zero-match left rows survive) with all left
    columns, and right columns prefixed ``r_``.

    Aggregation-oriented contract: a left row surfaces once per
    (probe bucket that found matches ∪ unmatched probes), so consumers
    must aggregate per left key counting only non-null ``r_*`` values
    (COUNT ignores nulls, so counts are exact); for raw pairs, filter
    ``r_*`` non-null first.
    """
    lb = left.withColumn("_lus", F.unix_micros(F.col(left_ts))).withColumn(
        "_bucket",
        F.explode(
            F.array(
                F.floor(F.col("_lus") / window_us),
                F.floor(F.col("_lus") / window_us) + 1,
            )
        ),
    )
    rb = right.select(
        F.col(on).alias("_ron"),
        F.unix_micros(F.col(right_ts)).alias("_rus"),
        F.floor(F.unix_micros(F.col(right_ts)) / window_us).alias("_bucket"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (on, right_ts)
        ],
    )
    cond = (
        (lb[on] == rb["_ron"])
        & (lb["_bucket"] == rb["_bucket"])
        & (rb["_rus"] > lb["_lus"])
        & (rb["_rus"] <= lb["_lus"] + window_us)
    )
    return lb.join(rb, cond, "left").drop("_ron", "_lus", "_rus", "_bucket")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    right_tie: str | None = None,
) -> DataFrame:
    """Forward-inclusive as-of join: for each left row, the single
    right row with the SMALLEST ``right_ts >= left_ts`` in the same
    ``on`` group (ties on right_ts broken by smallest ``right_tie``).

    Same single-shuffle merge construction as ``asof_join``, mirrored:
    left rows sort BEFORE right rows at equal ts (_side 0 < 1), and a
    running ``first(..., ignoreNulls)`` over a CurrentRow→
    UnboundedFollowing frame picks the earliest following right row.
    """
    right_payload = right_payload or [c for c in right.columns if c != on]
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ats"),
        (F.col(right_tie) if right_tie else F.lit(0)).alias("_tie"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_rpay"),
        F.lit(1).alias("_side"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_ats"),
        F.lit(0).alias("_tie"),
        F.lit(0).alias("_side"),
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ats"), F.col("_side"), F.col("_tie"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    matched = merged.withColumn(
        "_match", F.first("_rpay", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 0)
    return matched.select(
        *[F.col(c) for c in left.columns],
        *[F.col("_match")[c].alias(f"asof_{c}") for c in right_payload],
    )
