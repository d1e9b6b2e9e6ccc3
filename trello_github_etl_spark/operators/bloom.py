"""Deterministic Bloom-filter runtime pruning — the sketch behind
Spark's runtime row-group filters and dynamic semi-join pushdown,
built here from md5-derived bit positions so the filter (and its
false-positive count) is bit-identical on any engine.

Scale shape: the BUILD is one aggregation over the dim side —
per-key bit masks bit_or-combine map-side, so the full filter is
W words regardless of input size. The PROBE broadcasts those W words
(kilobytes) and tests k bits per fact row in a narrow pass — the
fact table never shuffles. That is exactly the plan shape of a
runtime-filtered join at 100 TB: scan-local pruning before any
exchange, false positives resolved by the real join afterwards.

Word layout: 63 usable bits per 64-bit word (the sign bit stays
clear), so every mask is a positive BIGINT and ``1 << bit`` behaves
identically across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trello_github_etl_spark.operators.dedup import _token_hash60

BLOOM_K = 3  # hash functions per key
BITS_PER_WORD = 63
NUM_WORDS = 64
NUM_BITS = BITS_PER_WORD * NUM_WORDS


def _positions(key: Column) -> list[Column]:
    """k md5-derived bit positions in [0, NUM_BITS) for a string key."""
    return [
        _token_hash60(F.concat(F.lit(f"{i}|"), key)) % NUM_BITS
        for i in range(BLOOM_K)
    ]


def build_bloom(keys: DataFrame, key_col: str) -> DataFrame:
    """(word_idx, word) rows of the filter over the distinct keys."""
    key = F.col(key_col).cast("string")
    pos_rows = keys.select(
        F.explode(F.array(*_positions(key))).alias("pos")
    )
    return (
        pos_rows.select(
            (F.col("pos") / BITS_PER_WORD).cast("int").alias("word_idx"),
            # F.shiftleft only takes a literal shift; the SQL form
            # accepts a column expression
            F.expr(
                "shiftleft(CAST(1 AS BIGINT),"
                f" CAST(pos % {BITS_PER_WORD} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def probe_bloom(
    facts: DataFrame, bloom: DataFrame, key_col: str
) -> DataFrame:
    """facts + a ``bloom_pass`` flag: true iff all k bits are set.

    The filter is collected driver-side (W words — kilobytes, by
    construction; this is what "runtime filter" means: the sketch is
    SMALL enough to ship into the scan) and inlined as one BIGINT
    array literal. The probe is then a pure narrow projection —
    element_at + shift per hash, zero joins, zero shuffles — i.e. a
    scan-local predicate, exactly how engines push Bloom filters into
    row-group pruning. Missing words read as 0 (bit clear).
    """
    words = {r["word_idx"]: r["word"] for r in bloom.collect()}
    arr = "array({})".format(
        ", ".join(
            f"CAST({words.get(i, 0)} AS BIGINT)" for i in range(NUM_WORDS)
        )
    )
    key = F.col(key_col).cast("string")
    # scratch columns carry a collision-proof prefix: plain _p0/_hit0
    # names would silently clobber (and then drop) same-named caller
    # columns, e.g. when chaining probe_bloom for a second key
    # (r4 code review)
    out = facts
    for i, pos in enumerate(_positions(key)):
        # position materialized in its own projection so the md5 fold
        # is evaluated once, then referenced by index and shift
        out = out.withColumn(f"_bloom_p{i}__", pos).withColumn(
            f"_bloom_hit{i}__",
            F.expr(
                f"shiftright(element_at({arr},"
                f" CAST(_bloom_p{i}__ DIV {BITS_PER_WORD} AS INT) + 1),"
                f" CAST(_bloom_p{i}__ % {BITS_PER_WORD} AS INT)) % 2 = 1"
            ),
        )
    return (
        out.withColumn(
            "bloom_pass",
            F.expr(" AND ".join(f"_bloom_hit{i}__" for i in range(BLOOM_K))),
        )
        .drop(*[f"_bloom_p{i}__" for i in range(BLOOM_K)])
        .drop(*[f"_bloom_hit{i}__" for i in range(BLOOM_K)])
    )
