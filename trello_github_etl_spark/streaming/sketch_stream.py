"""Continuous sketch maintenance: a Count-Min grid kept current over
micro-batches via the mergeability property (union of streams = sum
of grids).

Per batch: build the BATCH's grid (bounded: depth*width cells no
matter the batch size), cell-wise-sum it into the stored grid, commit
through the state store's CAS. History is never re-read; the running
state is one grid. This is the streaming twin of dedup_stream's
fingerprint loop, with bounded rather than growing state — the shape
a 100 TB/day token-frequency monitor actually runs.

Replay caveat (and why the loop records batch ids): unlike the
fingerprint MERGE, a SUM is NOT idempotent — re-adding a replayed
batch would double-count it. The store's manifest carries the last
applied batch id; a batch at or below it is skipped, which composes
with foreachBatch's monotonically increasing batch ids to make
at-least-once delivery exactly-once (the same gate rollup_stream
uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from trello_github_etl_spark.operators.sketch import (
    countmin_table,
    merge_countmin,
)
from trello_github_etl_spark.plans.state_store import VersionedStateStore

GRID_SCHEMA = StructType(
    [
        StructField("d", LongType()),
        StructField("cell", LongType()),
        StructField("cnt", LongType()),
    ]
)


def read_grid(spark: SparkSession, store: VersionedStateStore) -> DataFrame:
    if store.latest_version() == 0:
        return spark.createDataFrame([], GRID_SCHEMA)
    return store.read(spark)


def last_applied_batch(store: VersionedStateStore) -> int:
    # The gate lives in the manifest's top-level ``meta`` — published
    # atomically with each commit and NOT rewritten by vacuum(), so the
    # gate cannot regress when old history entries are pruned (the
    # history-derived variant double-counted a replayed batch after a
    # vacuum pruned the last cms-batch entry). History scan remains as
    # the fallback for stores written before the meta field existed.
    gate = store.get_meta("cms_last_batch")
    if gate is not None:
        return int(gate)
    return max(
        (
            int(c.op.split(":", 1)[1])
            for c in store.history()
            if c.op.startswith("cms-batch:")
        ),
        default=-1,
    )


def apply_batch(
    spark: SparkSession,
    store: VersionedStateStore,
    batch: DataFrame,
    batch_id: int,
    token_col: str = "token",
) -> bool:
    """Merge one micro-batch's grid into the state; returns False if
    the batch id was already applied (replay → skipped).

    OPERATIONAL CONSTRAINT (r4 code review): batch ids belong to the
    streaming CHECKPOINT lineage — resetting the checkpoint while the
    store survives restarts ids at 0 and this gate would silently
    skip new batches up to the stored high-water mark. Store and
    checkpoint must live and die together."""
    if batch_id <= last_applied_batch(store):
        return False
    base = store.latest_version()
    current = read_grid(spark, store)
    batch_grid = countmin_table(batch, token_col).select(
        F.col("d").cast("long"), F.col("cell").cast("long"), "cnt"
    )
    merged = merge_countmin(current.unionByName(batch_grid))
    store.commit(
        merged,
        op=f"cms-batch:{batch_id}",
        expected_version=base,
        meta={"cms_last_batch": batch_id},
    )
    return True


def stream_sketch(
    stream: DataFrame,
    store: VersionedStateStore,
    checkpoint_dir: str,
    token_col: str = "token",
):
    """foreachBatch wiring for a live token stream."""
    # startup crash recovery — see stream_dedup's note /
    # VersionedStateStore.recover_orphans
    store.recover_orphans()

    def handle(batch: DataFrame, batch_id: int) -> None:
        apply_batch(
            batch.sparkSession, store, batch, batch_id, token_col
        )

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
