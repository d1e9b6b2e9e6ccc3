"""Sequence packing for LLM pretraining batches — the step between a
cleaned corpus and the trainer: fill fixed token-budget sequences
from variable-length documents (BASELINE.json north star; no
reference analog — cited as spec-free extension).

Two industry-standard strategies, two very different Spark shapes:

- ``concat_chunk_packing`` (GPT-style): concatenate the shard's token
  stream and cut every ``budget`` tokens; documents may straddle
  sequence boundaries. Pure prefix-sum window math — one shuffle per
  shard ordering, no Python, no state — so it scales like any
  windowed aggregation.
- ``greedy_pack`` (no-split first-fit-sequential): a document never
  straddles sequences; open a new sequence when the next document
  would overflow the budget. Inherently sequential per shard (the
  bin index depends on every prior decision — not expressible as an
  associative window), so it runs as ``applyInPandas`` over shards:
  per-group linear state, Arrow-batched, deterministic doc_id order.

Sharding is the scale lever for BOTH: packing quality only needs
*local* order, so the corpus is hash-sharded (``doc_id % shards``)
and each shard packs independently — parallelism = ``shards``,
regardless of corpus size. At 100 TB you set shards ≈ a few × the
cluster's task slots; the per-shard stream stays a narrow sorted
pass. The greedy variant's state is three integers per shard —
nothing accumulates in memory.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PACK_SCHEMA = (
    "shard long, doc_id long, n_tokens long, seq_idx long, fill long"
)


def concat_chunk_packing(
    docs: DataFrame,
    budget: int,
    shards: int = 8,
    id_col: str = "doc_id",
    cost_col: str = "n_tokens",
    order_col: str | None = None,
    shard_col: str | None = None,
) -> DataFrame:
    """Concatenate-and-chunk packing plan. Returns one row per doc:
    (shard, doc_id, n_tokens, start_seq, start_off, end_seq) — which
    fixed-size sequence the doc starts in, at what offset, and where
    it ends. Empty docs get start_seq == end_seq.

    ``order_col`` overrides the within-shard stream order (default:
    ``id_col``); production packing orders by a shuffle key so the
    training stream is permuted (pipe7), with ``id_col`` as the
    unique tie-break. ``shard_col`` supplies a precomputed shard
    (e.g. a hash-key prefix) instead of the default ``id % shards``.
    """
    iid = F.col(id_col)
    order = (
        [id_col] if order_col is None else [order_col, id_col]
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_cum = F.coalesce(F.sum(cost_col).over(w), F.lit(0))
    n = F.col(cost_col)
    shard = iid % shards if shard_col is None else F.col(shard_col)
    return (
        docs.withColumn("shard", shard)
        .withColumn("_prev", prev_cum)
        .select(
            "shard",
            iid.alias("doc_id"),
            n.alias("n_tokens"),
            F.floor(F.col("_prev") / budget).alias("start_seq"),
            (F.col("_prev") % budget).alias("start_off"),
            F.floor(
                (F.col("_prev") + F.greatest(n, F.lit(1)) - 1) / budget
            ).alias("end_seq"),
        )
    )


SHUFFLE_BUCKETS = 256  # first hex byte of the key; order-preserving


def deterministic_shuffle(
    docs: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuffle-epoch-0",
) -> DataFrame:
    """Deterministic global shuffle — the training-order permutation
    every pretraining run needs, reproducible on any cluster size
    (never RNG, never row order; same contract as the hash splits).

    Rank = position in the ordering by ``md5(salt || id)``. A naive
    ``row_number() OVER (ORDER BY key)`` collapses to ONE partition —
    the classic global-sort bottleneck — so this computes the same
    rank in two parallel phases: (1) the first hex byte of the key
    range-buckets the corpus (md5-uniform → balanced); per-bucket
    counts (≤ 256 rows, KBs) come to the driver and become a
    broadcast prefix-sum offset map, then (2) a window ranks WITHIN
    each bucket in parallel and adds the bucket's offset. Changing
    ``salt`` reshuffles (epoch reseeding) without touching the data.

    Returns (doc_id, bucket, shuffle_pos) with shuffle_pos a dense
    1-based total order.
    """
    iid = F.col(id_col)
    key = F.md5(F.concat(F.lit(salt + "|"), iid.cast("string")))
    keyed = docs.select(
        iid.alias("doc_id"),
        key.alias("_key"),
        F.conv(F.substring(key, 1, 2), 16, 10).cast("int").alias("bucket"),
    ).localCheckpoint(eager=True)
    # ^ materialized once: the counts collect below AND the ranking
    # pass both probe this frame — without the checkpoint each would
    # re-scan the corpus and recompute every md5 key (2x the work at
    # any scale; on a cluster, persist() instead)
    counts = {
        r["bucket"]: r["n"]
        for r in keyed.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for b in range(SHUFFLE_BUCKETS):
        offsets[b] = acc
        acc += counts.get(b, 0)
    offset_col = F.element_at(
        F.create_map(
            *[F.lit(x) for b in offsets for x in (b, offsets[b])]
        ),
        F.col("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("_key", "doc_id")
    return keyed.select(
        "doc_id",
        "bucket",
        (offset_col + F.row_number().over(w)).cast("long").alias(
            "shuffle_pos"
        ),
    )


def curriculum_order(
    docs: DataFrame,
    stage_col: str = "stage",
    id_col: str = "doc_id",
    salt: str = "curriculum-0",
) -> DataFrame:
    """Curriculum training order: a dense global position ordered by
    (stage DESC, md5 key) — highest-stage (e.g. highest-quality
    decile) documents first, deterministically shuffled WITHIN each
    stage (same epoch-reseed contract as deterministic_shuffle).

    Same no-single-partition-sort construction, one level deeper:
    the composite (stage, first-hex-byte) key range-buckets the
    corpus into |stages|×256 balanced cells; per-cell counts (KBs)
    become a broadcast prefix-sum offset map laid out in
    stage-descending, bucket-ascending order, and a window ranks
    within each cell in parallel.  ``stage`` must be a
    deterministically derived small int (callers clamp; the map
    key packs stage*256+bucket).

    Returns (doc_id, stage, curriculum_pos), 1-based dense order.
    """
    iid = F.col(id_col)
    key = F.md5(F.concat(F.lit(salt + "|"), iid.cast("string")))
    keyed = docs.select(
        iid.alias("doc_id"),
        F.col(stage_col).cast("int").alias("stage"),
        key.alias("_key"),
        F.conv(F.substring(key, 1, 2), 16, 10).cast("int").alias("_bkt"),
    ).localCheckpoint(eager=True)
    counts = {
        (r["stage"], r["_bkt"]): r["n"]
        for r in keyed.groupBy("stage", "_bkt")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    stages = sorted({s for s, _ in counts}, reverse=True)
    offsets, acc = {}, 0
    for s in stages:
        for b in range(SHUFFLE_BUCKETS):
            if (s, b) in counts:
                offsets[s * SHUFFLE_BUCKETS + b] = acc
                acc += counts[(s, b)]
    offset_col = F.element_at(
        F.create_map(*[F.lit(x) for k, v in offsets.items() for x in (k, v)]),
        F.col("stage") * SHUFFLE_BUCKETS + F.col("_bkt"),
    )
    w = Window.partitionBy("stage", "_bkt").orderBy("_key", "doc_id")
    return keyed.select(
        "doc_id",
        "stage",
        (offset_col + F.row_number().over(w)).cast("long").alias(
            "curriculum_pos"
        ),
    )


def greedy_pack(
    docs: DataFrame,
    budget: int,
    shards: int = 8,
    id_col: str = "doc_id",
    cost_col: str = "n_tokens",
) -> DataFrame:
    """No-split packing: per shard in doc_id order, a doc joins the
    open sequence unless it would overflow ``budget`` — then a new
    sequence opens. Oversized docs (> budget) get a sequence of their
    own. Returns (shard, doc_id, n_tokens, seq_idx, fill) where
    ``fill`` is the sequence occupancy after placing the doc.
    """

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs, fills = [], []
        seq, fill = 0, 0
        first = True
        for n in pdf["n_tokens"]:
            n = int(n)
            if first:
                seq, fill, first = 0, n, False
            elif fill + n > budget:
                seq, fill = seq + 1, n
            else:
                fill += n
            seqs.append(seq)
            fills.append(fill)
        pdf["seq_idx"] = seqs
        pdf["fill"] = fills
        return pdf[["shard", "doc_id", "n_tokens", "seq_idx", "fill"]]

    base = docs.select(
        (F.col(id_col) % shards).alias("shard"),
        F.col(id_col).alias("doc_id"),
        F.col(cost_col).cast("long").alias("n_tokens"),
    )
    return base.groupBy("shard").applyInPandas(pack_shard, PACK_SCHEMA)
