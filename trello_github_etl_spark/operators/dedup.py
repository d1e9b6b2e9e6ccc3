"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard (BASELINE.json north star).

Determinism contract: every hash is md5-derived, so DuckDB oracles
reproduce results bit-for-bit — no engine-specific hash functions.

Scale design:
- exact: one hash-aggregate on the fingerprint (shuffle on md5 key,
  uniformly distributed → no skew);
- minhash-LSH: signatures are per-row array math (no shuffle), bucket
  join shuffles on (band, key) — candidate pairs only, never all
  pairs;
- simhash: per-row 32-bit signature via per-bit majority, one
  aggregate per doc;
- jaccard: exact verification joined through a shared-shingle
  blocking join — the common/|A∪B| counts come from one shuffle on
  shingle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trello_github_etl_spark.operators.textstats import (
    fingerprint,
    shingles,
    tokens,
)

NUM_MINHASHES = 8
LSH_BANDS = 4  # 2 rows per band
SIMHASH_BITS = 32


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (canonicalized) docs; keeper = min id."""
    fp = docs.select(
        F.col("doc_id"), fingerprint(F.col(text_col)).alias("fp")
    )
    return (
        fp.groupBy("fp")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("keeper_id"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", num_hashes: int = NUM_MINHASHES
) -> DataFrame:
    """Per-doc minhash signature: sig[i] = min(h60(i || '|' || shingle)),
    where h60 is the first 60 bits of md5 as a bigint — a minhash over
    a 60-bit md5-derived family seeded by i.

    Shape: explode shingles → one groupBy with ``num_hashes`` min
    aggregates. Each md5 is computed exactly once per (shingle, seed),
    and partial (map-side) aggregation means the shuffle carries one
    partial signature per doc per map partition — never raw shingle
    rows. Two deliberate physical-plan properties: (a) the
    all-in-one-projection alternative
    (``array_min(transform(shingles, md5))`` × seeds) duplicates the
    whole tokenize→shingle subtree into every seed expression and was
    ~100× slower end-to-end; (b) min over BIGINT keeps the agg buffer
    fixed-width so Spark plans a HashAggregate — min over md5 hex
    *strings* falls back to SortAggregate (sort both sides of the
    shuffle), which loses map-side combine efficiency at scale.
    """
    sh = docs.select(
        F.col("doc_id"), F.explode(shingles(F.col(text_col))).alias("shingle")
    )
    mins = [
        F.min(
            _token_hash60(F.concat(F.lit(f"{i}|"), F.col("shingle")))
        ).alias(f"_m{i}")
        for i in range(num_hashes)
    ]
    return (
        sh.groupBy("doc_id")
        .agg(*mins)
        .select(
            "doc_id",
            F.array(*[f"_m{i}" for i in range(num_hashes)]).alias("sig"),
        )
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = NUM_MINHASHES,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Candidate near-dup pairs: equal signature rows in ≥1 LSH band.

    The band index is prefixed into the bucket key so the self-join is
    a single-column equi-join; both sides share the signature subtree,
    so AQE plans a ReusedExchange for the second side instead of
    recomputing signatures.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, num_hashes)
    # bigint sig entries render as plain decimal digits, so the
    # "|"-separated key is collision-free (separator ∉ digits)
    band_keys = F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)],
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select("doc_id", F.explode(band_keys).alias("band_key"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def _token_hash60(tok) -> F.Column:
    """First 15 md5 hex chars as a 60-bit bigint (conv base16→10)."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("bigint")


def simhash(docs: DataFrame, text_col: str = "text", bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash over distinct tokens (weight 1 per token).

    bit b set iff Σ_tokens (h>>b & 1 ? +1 : -1) > 0. One explode +
    one aggregate with `bits` sum expressions; signature reassembled
    as Σ 2^b.
    """
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok")
    ).withColumn("h", _token_hash60(F.col("tok")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(2 ** b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = term if sig is None else sig + term
    return agg.select("doc_id", sig.alias("simhash"))


def jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.2,
    block_col: str = "lang",
) -> DataFrame:
    """Exact n-gram Jaccard over shared-shingle candidates.

    Only pairs sharing ≥1 shingle (and a blocking key) are scored:
    jaccard = common / (|A| + |B| - common). The shuffle key is the
    shingle hash — uniformly distributed, skew-safe.
    """
    sh = docs.select(
        "doc_id",
        F.col(block_col).alias("_blk"),
        F.explode(shingles(F.col(text_col))).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))

    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )
