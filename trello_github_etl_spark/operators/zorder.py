"""Z-order (Morton) clustering for multi-column data skipping.

Single-column sort layouts prune row groups only on the leading
column; a selective predicate on any OTHER column reads everything.
Interleaving the bits of k normalized key columns into one Morton key
and range-sorting the write on it keeps every row group tight in ALL
k dimensions at once — a box predicate on any subset of the keys
skips most row groups via ordinary parquet min/max stats. This is
the standard lakehouse layout trick (Delta OPTIMIZE ZORDER BY,
Hudi/Iceberg clustering) reproduced on plain parquet.

The bit math is pure integer arithmetic (div / mod / multiply — no
engine-specific bit operators), generated ONCE as SQL text shared by
the Spark plan and the DuckDB oracle, so the layout key itself is
oracle-checkable. Writes use repartitionByRange(zkey) +
sortWithinPartitions(zkey): total order across files, one shuffle,
and each row group spans a contiguous Morton range.

Scale: the z-key is O(bits·k) cheap codegen per row; the write
shuffle is the same range-exchange any sorted write pays. Pruning
effectiveness is verified empirically in tests by counting row
groups whose min/max overlap a 2-D box in each layout (pyarrow
metadata — the same stats Spark's scan consults).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue_sql(cols: list[str], bits: int = 10) -> str:
    """SQL text computing the Morton interleave of ``cols``.

    Each input must already be an integer in [0, 2^bits). Bit b of
    column i lands at output bit ``b*k + i``: since
    (x % 2^(b+1)) - (x % 2^b) equals bit_b(x) * 2^b, the term
    ((x % 2^(b+1)) - (x % 2^b)) * 2^(b*(k-1)+i) contributes
    bit_b(x) << (b*k+i). Only ``%``, ``-`` and ``*`` are used —
    integer operators with identical semantics in Spark SQL and
    DuckDB (integer ``//``/``div`` differ between the two).
    """
    k = len(cols)
    if k * bits > 63:
        # the top interleaved bit would land past BIGINT's sign bit:
        # Spark (non-ANSI) wraps to NEGATIVE Morton keys — a silently
        # corrupted layout — while DuckDB raises, breaking the
        # shared-text contract (r4 code review)
        raise ValueError(
            f"k*bits = {k}*{bits} = {k * bits} > 63 overflows the "
            "BIGINT Morton key; lower bits or interleave fewer columns"
        )
    terms = []
    for i, c in enumerate(cols):
        for b in range(bits):
            terms.append(
                f"(({c} % {1 << (b + 1)}) - ({c} % {1 << b}))"
                f" * {1 << (b * (k - 1) + i)}"
            )
    return "(" + " + ".join(terms) + ")"


def zvalue(cols: list[str], bits: int = 10) -> Column:
    """Column form of :func:`zvalue_sql` (same text → same values)."""
    return F.expr(zvalue_sql(cols, bits)).cast("bigint")


def normalize_to_bits(col: Column, lo: int, hi: int, bits: int = 10) -> Column:
    """Map an integer column with known [lo, hi] stats onto
    [0, 2^bits): rank-preserving fixed-width bucketing. Stats come
    from the table profile (prof1) — the same place OPTIMIZE gets
    them."""
    span = max(hi - lo, 1)
    buckets = (1 << bits) - 1
    # clamp to the profiled range: rows appended AFTER profiling can
    # fall outside [lo, hi], and an out-of-range bucket bleeds bits
    # into OTHER columns' interleave positions (zvalue's %-decompose
    # assumes [0, 2^bits)) — a silently non-monotonic layout
    # (r4 code review). Clamped rows degrade to edge buckets, which
    # only costs pruning precision, never correctness. NULL inputs
    # stay NULL: greatest()/least() skip NULLs, so without the guard
    # a NULL value would silently land in bucket 0 and co-locate with
    # minimum-value rows (r4 advice) — propagate instead, matching the
    # pre-clamp behavior.
    clamped = F.when(
        col.isNull(), F.lit(None).cast("bigint")
    ).otherwise(F.least(F.greatest(col, F.lit(lo)), F.lit(hi)))
    return (
        ((clamped - F.lit(lo)).cast("bigint") * buckets / F.lit(span))
        .cast("bigint")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    zcol: Column,
    n_files: int = 8,
) -> None:
    """Range-partition + sort by the Morton key and write parquet;
    small row groups (64 KiB blocks) at test scale so per-row-group
    pruning is observable."""
    (
        df.withColumn("_zorder_key__", zcol)
        .repartitionByRange(n_files, "_zorder_key__")
        .sortWithinPartitions("_zorder_key__")
        .drop("_zorder_key__")
        .write.mode("overwrite")
        .option("parquet.block.size", 1 << 16)
        .parquet(path)
    )
