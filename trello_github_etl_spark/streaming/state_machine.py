"""Stateful streaming migration phases (SURVEY.md §2.7 ST1).

The reference gates re-execution per card/item with a persisted phase
(`M_CREATED=0` → `M_LISTS=1`, etl.js:3–4, 47–50, 200–203). The
streaming analog: a keyed state machine over an entity-event stream,
implemented with ``applyInPandasWithState`` — each micro-batch folds
new events into the per-entity phase and emits transitions.

Phases only move forward (idempotent re-delivery is a no-op), exactly
like the reference's `if (cardMeta.migration > M_CREATED) return`.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from trello_github_etl_spark.plans.upserts import M_CREATED, M_LISTS

# op → phase it completes
OP_PHASE = {"create": M_CREATED, "add_to_lists": M_LISTS}

OUTPUT_SCHEMA = StructType(
    [
        StructField("entity_id", StringType()),
        StructField("phase", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("phase", LongType())])


def _advance(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    phase = state.get[0] if state.exists else -1
    # applyInPandasWithState guarantees NO intra-group row order and
    # the ops carry no timestamp, so process a micro-batch's ops in
    # ascending TARGET-PHASE order: [add_to_lists, create] arriving
    # together must land as create->add_to_lists, not drop the
    # add_to_lists forever (it is consumed either way; r4 code
    # review). Cross-batch reordering still needs redelivery — the
    # source contract — but within a batch the machine is now
    # order-independent.
    targets = sorted(
        OP_PHASE.get(op, -1) for pdf in batches for op in pdf["op"]
    )
    for target in targets:
        # forward-only: re-delivered ops never regress the phase
        if target == phase + 1:
            phase = target
    state.update((phase,))
    yield pd.DataFrame({"entity_id": [key[0]], "phase": [phase]})


def migration_phases(entity_ops: DataFrame) -> DataFrame:
    """entity_ops(entity_id string, op string) stream → latest phase."""
    return entity_ops.groupBy("entity_id").applyInPandasWithState(
        _advance,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
