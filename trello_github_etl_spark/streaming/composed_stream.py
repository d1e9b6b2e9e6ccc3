"""The composed ingest loop: crawl stream → near-dup gate → rollup
maintenance → REST sink, as ONE ``foreachBatch`` transaction per
micro-batch (VERDICT r5 #5). This is the reference's end-to-end shape
(etl.js main: fetch → filter → transform → upsert, lib/trello.js →
lib/gh.js) re-expressed over the streaming near-dup corpus state.

Per micro-batch, IN THIS ORDER:

1. **classify** — ``incremental_near_dedup`` against the band-bucket
   state (deterministic given state; the signature pipeline is
   pinned once via localCheckpoint);
2. **rollup merge** — KEPT docs' per-source aggregates delta-merged
   into the materialized rollup, gated by last-merged batch_id
   (rollup_stream.merge_rollup_delta: replay ⇒ skip);
3. **sink** — kept docs through the throttled/backoff REST sink
   (rest_sink.run_sink; at-least-once, receiver dedupes on doc_id);
4. **admit** — kept docs' band keys CAS-committed into the band
   state (neardup_stream's no-op skip: zero kept ⇒ no version).

The ORDER is the crash-safety argument. Steps 2–4 are individually
replay-safe (2 by batch-id gate, 3 by idempotent keys, 4 by CAS +
no-op skip), but only this order makes every crash PREFIX replay to
a consistent state, because step 4 is what flips the next replay's
verdicts: a crash before 4 replays with UNCHANGED band state ⇒ the
classification reproduces bit-identically and the missing steps rerun
(2 skips if it already merged, 3 re-sends — the at-least-once window
— 4 completes); a crash after 4 means every step already ran, and the
replay classifies the batch's keepers as ``dup_existing_near`` ⇒ zero
kept ⇒ 2 gated, 3 sends nothing, 4 no-op. Admitting bands FIRST would
instead replay a crashed batch into "all dup_existing_near" with the
rollup never merged and the sink never fed — silent data loss.

At 100 TB/day the per-batch cost is O(batch + affected rollup keys +
corpus band keys); the corpus text is never re-read.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trello_github_etl_spark.operators.textstats import token_count
from trello_github_etl_spark.plans.state_store import VersionedStateStore
from trello_github_etl_spark.sources.rest_sink import SinkConfig, run_sink
from trello_github_etl_spark.streaming.neardup_stream import (
    admit_kept,
    classify_batch,
)
from trello_github_etl_spark.streaming.rollup_stream import (
    merge_rollup_delta,
)

# Token-metric version namespace for the ingest ledger. r8 switched
# the ledger's token measure from split(text,' ') to the canonical
# textstats regex (different UNITS: split counts empty strings
# between consecutive spaces). A pre-change VersionedStateStore
# ledger resumed under the new code would silently accumulate
# regex-based deltas on top of split-based totals (r8 advice), so the
# ledger state lives under a tokenization-versioned subdirectory:
# resuming over an old rollup_dir starts a fresh v2 ledger instead of
# mixing units; the old root-level state stays readable for a manual
# backfill/migration. Bump this name if the token metric's units ever
# change again.
TOKEN_LEDGER_NAMESPACE = "ledger-tokens-v2"


def token_ledger_dir(rollup_dir: str) -> str:
    """The versioned subdirectory of ``rollup_dir`` where the ingest
    token ledger actually lives (see TOKEN_LEDGER_NAMESPACE). Readers
    (tests, ops tooling) must use this path, not the root."""
    return os.path.join(rollup_dir, TOKEN_LEDGER_NAMESPACE)


def ingest_batch(
    spark: SparkSession,
    band_store: VersionedStateStore,
    rollup_dir: str,
    batch: DataFrame,
    batch_id: int,
    transport: Callable[[dict], None],
    text_col: str = "text",
    source_col: str = "source",
    sink_cfg: SinkConfig | None = None,
    sleep: Callable[[float], None] | None = None,
) -> DataFrame:
    """One composed micro-batch (see module docstring for the
    classify → rollup → sink → admit ordering contract). Returns the
    verdict frame. The rollup maintained is
    ``groupBy(source).agg(sum(token_count) AS tokens, count AS n_docs)``
    over KEPT docs only — the canonical "what did we actually admit
    per source" training-data ledger."""
    # 1. classify (shared transaction half — neardup_stream)
    base, bands, batch_bands, verdicts = classify_batch(
        spark, band_store, batch, text_col
    )
    kept = batch.join(
        verdicts.filter(F.col("verdict") == "kept").select("doc_id"), "doc_id"
    ).localCheckpoint(eager=True)

    if not kept.isEmpty():
        # 2. rollup merge (batch-id gated ⇒ effectively-once). An
        # all-dup batch skips the merge entirely — merging an empty
        # delta would rewrite the whole state as a byte-identical new
        # version, the same churn admit_kept's no-op skip prevents
        # (r7 code review); the gate doesn't need to advance, a
        # replayed skipped batch just skips again.
        # canonical tokenization (textstats.tokens regex), NOT
        # split(text, ' ') — split counts empty strings between
        # consecutive spaces and would make this ledger the one
        # token metric in the repo inconsistent with every other
        # token count (r7 advice)
        delta = kept.groupBy(source_col).agg(
            F.sum(token_count(F.col(text_col)))
            .cast("long")
            .alias("tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        merge_rollup_delta(
            delta,
            token_ledger_dir(rollup_dir),
            batch_id,
            [source_col],
            ["tokens"],
            "n_docs",
        )

        # 3. sink kept docs (at-least-once; idempotent doc_id keys)
        kwargs = {} if sleep is None else {"sleep": sleep}
        run_sink(
            kept.select("doc_id", source_col), transport, sink_cfg, **kwargs
        )

    # 4. admit kept docs' band keys (shared transaction half:
    # CAS + no-op skip)
    admit_kept(
        band_store,
        bands,
        batch_bands,
        kept.select("doc_id"),
        base,
        op="composed-ingest",
    )
    return verdicts


def stream_ingest(
    stream: DataFrame,
    band_store: VersionedStateStore,
    rollup_dir: str,
    checkpoint_dir: str,
    transport: Callable[[dict], None],
    on_batch: Callable[[int, DataFrame], None] | None = None,
    **kwargs,
):
    """Wire the composed batch plan into foreachBatch. ``on_batch``
    receives (batch_id, verdicts) for observability/testing."""
    # startup crash recovery — see stream_dedup's note /
    # VersionedStateStore.recover_orphans
    band_store.recover_orphans()

    def handle(batch: DataFrame, batch_id: int) -> None:
        verdicts = ingest_batch(
            batch.sparkSession,
            band_store,
            rollup_dir,
            batch,
            batch_id,
            transport,
            **kwargs,
        )
        if on_batch is not None:
            on_batch(batch_id, verdicts)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
