"""Incremental view maintenance: keep a materialized aggregate
current by merging delta batches (inserts AND retractions) instead of
recomputing from the base table.

The reference replays its whole board every run and skips unchanged
rows one key at a time (SURVEY.md §2.2 P9, etl.js:113-146); the
engine-grade generalization is delta-merge over ASSOCIATIVE aggregate
state: counts and exact DECIMAL sums merge by addition, retractions
are deltas with negated measures, and a group whose maintained count
reaches zero is dropped (it no longer exists in the view).

Scale: this is THE pattern that makes a 100 TB rollup maintainable —
each refresh touches |delta| rows plus |state| of the affected keys
(one shuffle on the group keys), never the 100 TB base. Measures must
be kept in exact form (DECIMAL, not DOUBLE) so merge order can never
drift the state; finalize to DOUBLE only at read time.

Derived averages/variances stay maintainable by storing power sums
(see queries/stats_q.py prof2): avg = sum/n, var from (n, sx, sxx) —
all addition-mergeable. MIN/MAX are NOT retraction-safe (a deleted
min needs a rescan of its group); insert-only views may still
maintain them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_agg_state(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    measures: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Merge aggregate-state deltas into a materialized aggregate.

    Both inputs carry ``keys + measures + count_col`` with measures in
    exact (decimal / integral) types. Groups whose merged count drops
    to zero are removed; a negative merged count means the caller
    retracted rows that were never in the state — surfaced as-is so
    tests/monitors can assert on it rather than silently clamping.
    """
    merged = (
        state.unionByName(delta)
        .groupBy(*keys)
        .agg(
            *[F.sum(m).alias(m) for m in measures],
            F.sum(count_col).alias(count_col),
        )
    )
    return merged.filter(F.col(count_col) != 0)


def retraction(
    delta: DataFrame, keys: list[str], measures: list[str], count_col: str = "n_rows"
) -> DataFrame:
    """Negate a delta's measures and count → a retraction batch."""
    return delta.select(
        *[F.col(k) for k in keys],
        *[(-F.col(m)).alias(m) for m in measures],
        (-F.col(count_col)).alias(count_col),
    )


def join_view_delta(
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Delta of the equi-join view A ⋈ B under insert deltas — the
    classic bilinear IVM identity:

        Δ(A ⋈ B) = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

    (the cross term keeps rows matching ONLY across the two deltas —
    dropping it is the textbook double-count-avoidance bug in the
    naive (A∪ΔA)⋈ΔB formulation). Returns the delta multiset;
    appending it to the materialized view IS the refresh.

    Scale shape: refresh cost is the two delta-side joins — at
    100 TB the deltas are batch-sized, so both big-side terms plan
    as a broadcast of the delta against a streaming scan of the
    base (never base ⋈ base, never a re-join of the full view), and
    the cross term is delta ⋈ delta (tiny). Insert-only by
    contract: retractions generalize by carrying a sign column
    (merge_agg_state's pattern) — a retraction in ΔA emits its
    matching view rows negated; MIN/MAX-style views stay
    non-maintainable under deletes (module docstring).
    """
    return (
        delta_a.join(base_b, on)
        .unionByName(base_a.join(delta_b, on))
        .unionByName(delta_a.join(delta_b, on))
    )


def signed_join_view_delta(
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    on: list[str] | str,
    view_cols: list[str],
    sign_col: str = "sign",
) -> DataFrame:
    """Join-view maintenance under inserts AND deletes — the signed
    (Z-relation) generalization of :func:`join_view_delta`, the
    algebra DBSP / differential dataflow build on: deltas carry a
    ``sign`` column (+1 insert, -1 delete of an existing base row),
    and the bilinear identity holds over signed multisets with sign
    MULTIPLICATION on the cross term:

        Δ(A ⋈ B) = (ΔA ⋈ B)·sa ∪ (A ⋈ ΔB)·sb ∪ (ΔA ⋈ ΔB)·sa·sb

    Signed contributions can cancel (a deleted order × an inserted
    lineitem of the same key produces +1 and -1 rows of the same
    view tuple through different terms), so the result is NETTED:
    group by the view columns, sum the signs, drop net-zero rows.
    Returns ``view_cols + [net]`` — apply to a stored view by adding
    ``net`` copies (negative = retract). Correctness gate: the net
    frame must equal the per-row count difference between the
    recomputed new view and the old view — that is exactly what the
    ivm5 oracle checks.

    Scale shape: same as the insert-only identity (delta-side joins
    broadcast against streaming base scans; base never joins base)
    plus ONE hash-aggregate on the view columns — the netting
    shuffle, sized by the delta's blast radius, not the view.
    """
    # resolve the sign FROM ITS DELTA FRAME, never by bare name: a
    # base frame carrying a same-named column (cascaded Z-relation
    # setups) would make F.col(sign_col) ambiguous — r5 code review
    t1 = delta_a.join(base_b, on).select(
        *view_cols, delta_a[sign_col].alias("_s")
    )
    t2 = base_a.join(delta_b, on).select(
        *view_cols, delta_b[sign_col].alias("_s")
    )
    da = delta_a.withColumnRenamed(sign_col, "_sa")
    db = delta_b.withColumnRenamed(sign_col, "_sb")
    t3 = da.join(db, on).select(
        *view_cols, (F.col("_sa") * F.col("_sb")).alias("_s")
    )
    return (
        t1.unionByName(t2)
        .unionByName(t3)
        .groupBy(*view_cols)
        .agg(F.sum("_s").alias("net"))
        .filter(F.col("net") != 0)
    )
