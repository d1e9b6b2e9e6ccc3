"""Count-Min sketch over token streams (Cormode & Muthukrishnan,
J. Algorithms 2005) — heavy-hitter estimation whose state is a FIXED
depth x width counter grid, independent of corpus size.

Why this matters at 100 TB: exact token counting shuffles a key space
that grows with the corpus (billions of distinct tokens); the sketch
shuffles at most depth*width cells — map-side combine collapses every
partition's contribution to <= 1,024 partial counters, so the
reduce-side state and the shuffle volume are CONSTANT. Estimates are
admissible overestimates (est >= true, within eps*N w.h.p.), the
standard trade for frequency queries / heavy-hitter gates in a
pretraining pipeline (stop-token detection, boilerplate token
flagging) without a corpus-sized aggregation.

Determinism: the d hash rows derive from md5('cms{d}|' || token) —
no RNG, bit-identical in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trello_github_etl_spark.operators.dedup import _token_hash60 as _h60

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_cells(token_col: str, depth: int, width: int):
    """The (d, cell) hash-struct array BOTH the build and the probe
    must derive identically — one definition, or a scheme change
    silently desyncs estimate from table (r4 code review)."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                (
                    _h60(F.concat(F.lit(f"cms{d}|"), F.col(token_col)))
                    % width
                ).alias("cell"),
            )
            for d in range(depth)
        ]
    )


def countmin_table(
    tokens_df: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(d, cell, cnt) counter grid from a token-stream frame (one row
    per token OCCURRENCE). One explode to (d, cell) pairs + one
    groupBy over depth*width keys — the whole reduce state is the
    grid."""
    return (
        tokens_df.select(F.explode(_cms_cells(token_col, depth, width)).alias("_dc"))
        .groupBy(F.col("_dc.d").alias("d"), F.col("_dc.cell").alias("cell"))
        .agg(F.count("*").alias("cnt"))
    )


def countmin_estimate(
    candidates: DataFrame,
    cms: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch: est(token) = min over d of the
    counter at (d, h_d(token)). The grid is KBs by construction, so
    the probe is a broadcast join on (d, cell); one min-agg per
    candidate follows."""
    probes = candidates.select(
        token_col, F.explode(_cms_cells(token_col, depth, width)).alias("_dc")
    ).select(token_col, F.col("_dc.d").alias("d"), F.col("_dc.cell").alias("cell"))
    return (
        probes.join(F.broadcast(cms), ["d", "cell"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
    )


KMV_K = 256
H60_SPAN = float(2**60)


def kmv_distinct_estimate(
    values_df: DataFrame, value_col: str = "token", k: int = KMV_K
) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al.,
    RANDOM 2002): keep the k smallest DISTINCT 60-bit hashes; if the
    k-th smallest is h, the hashes are uniform on [0, 2^60), so
    distinct-count ≈ (k-1) * 2^60 / h.

    Why not exact COUNT(DISTINCT) at 100 TB: exact needs a shuffle
    keyed by every distinct value; the sketch's k-smallest pass is a
    TopK — each partition forwards at most k candidates (partial
    take-ordered), the driver-side state is k longs. Same md5
    determinism contract as the Count-Min grid: the oracle reproduces
    the estimate bit-for-bit (single IEEE division of exact
    integers). Returns one row: (n_hashes_kept, kth_min, kmv_est).
    For inputs with fewer than k distinct values the estimate is
    replaced by the exact distinct count (the standard small-set
    fallback)."""
    hashed = values_df.select(
        _h60(F.col(value_col)).alias("h")
    ).distinct()
    return kmv_estimate_from_hashes(hashed, k=k)


def kmv_estimate_from_hashes(
    hashes: DataFrame, h_col: str = "h", k: int = KMV_K
) -> DataFrame:
    """Estimate from an ALREADY-HASHED (h) frame — the function
    merge_kmv's output feeds.  kmv_distinct_estimate re-hashes its
    input column, so passing it a merged sketch would silently
    double-hash and produce a plausible-but-wrong estimate (r4 code
    review); this is the single home of the estimate expression."""
    kmin = hashes.select(F.col(h_col).alias("h")).orderBy("h").limit(k)
    agg = kmin.agg(
        F.count("*").alias("n_hashes_kept"),
        F.max("h").alias("kth_min"),
    )
    est = F.when(
        F.col("n_hashes_kept") < k,
        F.col("n_hashes_kept").cast("double"),
    ).otherwise(
        F.lit(float(k - 1))
        * F.lit(H60_SPAN)
        / F.col("kth_min").cast("double")
    )
    return agg.select(
        "n_hashes_kept", "kth_min", est.alias("kmv_est")
    )


def merge_countmin(grids: DataFrame) -> DataFrame:
    """Merge Count-Min grids by cell-wise sum — sketches are
    MERGEABLE (union of streams = sum of grids), which is what makes
    them the incremental/distributed answer: each day's batch builds
    its grid independently, the running state is one grid of at most
    depth*width rows, and merging never re-reads history. Input: a
    union of (d, cell, cnt) frames."""
    return grids.groupBy("d", "cell").agg(F.sum("cnt").alias("cnt"))


def merge_kmv(kmins: DataFrame, k: int = KMV_K) -> DataFrame:
    """Merge KMV sketches: union the kept hashes, dedup, re-take the
    k smallest. Input: a union of (h) frames; output the merged
    (h) frame — feed to kmv_estimate_from_hashes (NOT
    kmv_distinct_estimate, which re-hashes its input)."""
    return kmins.select("h").distinct().orderBy("h").limit(k)
