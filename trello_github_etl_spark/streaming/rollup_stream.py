"""Continuously-maintained rollup: a Structured Streaming
``foreachBatch`` loop that keeps a materialized aggregate current by
IVM delta-merge (operators/ivm.py) instead of recomputing.

Per micro-batch: aggregate the batch to delta state (exact decimal
measures), merge into the versioned state table, flip the LATEST
pointer (same atomic read-current / write-next / pointer-swap
transaction as sink_stream.py). Work per batch is |batch| + |state of
affected keys| with one shuffle on the group keys — the base stream
is never replayed, which is what makes a 100 TB/day rollup
maintainable. With Delta available, the pointer dance collapses into
``MERGE INTO``.

At-least-once caveat: plain additive merge double-counts a replayed
batch, so the state records the last merged batch_id and the merge
skips batches at-or-below it (the checkpoint replays whole batches
with stable ids — monotone gate ⇒ effectively-once).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from trello_github_etl_spark.operators.ivm import merge_agg_state


def read_rollup(
    spark: SparkSession, state_dir: str, schema: str
) -> tuple[DataFrame, int]:
    """(current rollup, last merged batch_id); empty/-1 before batch 0."""
    pointer = os.path.join(state_dir, "LATEST")
    if not os.path.exists(pointer):
        return spark.createDataFrame([], schema), -1
    with open(pointer) as f:
        version = f.read().strip()
    df = spark.read.schema(schema).parquet(os.path.join(state_dir, version))
    return df, int(version[1:])


def merge_rollup_delta(
    delta: DataFrame,
    state_dir: str,
    batch_id: int,
    keys: list[str],
    measure_names: list[str],
    count_col: str = "n_rows",
) -> bool:
    """Merge one micro-batch's pre-aggregated delta into the rollup
    state at ``state_dir``; returns False when ``batch_id`` was
    already merged (the effectively-once replay gate). Factored out of
    stream_rollup so composed pipelines (composed_stream.py) share the
    identical gate + pointer-flip transaction instead of forking it.
    """
    spark = delta.sparkSession
    schema_str = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in delta.schema.fields
    )
    state, last_id = read_rollup(spark, state_dir, schema_str)
    if batch_id <= last_id:
        # replayed batch: already merged (effectively-once).
        # OPERATIONAL CONSTRAINT (r4 code review): batch ids are a
        # property of the streaming CHECKPOINT lineage — if the
        # checkpoint is reset while state_dir survives, the new
        # lineage restarts at batch 0 and this gate would silently
        # skip genuinely new batches up to last_id. state_dir and
        # checkpoint_dir must live and die TOGETHER.
        return False
    merged = merge_agg_state(state, delta, keys, measure_names, count_col)
    # SUM widens decimal precision per merge (18,2 -> 28,2 ->
    # 38,2); pin measures back to the delta's types so the stored
    # schema is stable across arbitrarily many batches. Ceiling
    # (r4 code review): once a running total exceeds the DELTA
    # type's range the non-ANSI cast yields NULL — callers whose
    # totals can outgrow a batch's natural type should aggregate
    # the delta at the wide type up front (e.g. sum over
    # decimal(38,2)) so the pinned type carries the headroom.
    merged = merged.select(
        *[F.col(k) for k in keys],
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in delta.schema.fields
            if f.name not in keys
        ],
    )
    version = f"v{batch_id}"
    merged.write.mode("overwrite").parquet(os.path.join(state_dir, version))
    tmp = os.path.join(state_dir, "LATEST.tmp")
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, os.path.join(state_dir, "LATEST"))
    return True


def stream_rollup(
    batches: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    measures: dict[str, "F.Column"],
    count_col: str = "n_rows",
) -> StreamingQuery:
    """Maintain ``groupBy(keys).agg(measures, count)`` over a stream.

    ``measures`` maps output column name → exact-typed aggregate
    expression evaluated per micro-batch (decimal sums, counts —
    anything addition-mergeable).
    """
    os.makedirs(state_dir, exist_ok=True)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = batch_df.groupBy(*keys).agg(
            *[expr.alias(name) for name, expr in measures.items()],
            F.count(F.lit(1)).alias(count_col),
        )
        merge_rollup_delta(
            delta, state_dir, batch_id, keys, list(measures.keys()), count_col
        )

    return (
        batches.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
