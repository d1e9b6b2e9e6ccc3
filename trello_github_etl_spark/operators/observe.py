"""Pipeline instrumentation via Spark's CollectMetrics operator.

The reference logs per-entity progress lines as it walks the board
(console sink S14: etl.js:31, 178-181, 192, 347). The Spark-native
equivalent is ``DataFrame.observe``: named aggregate metrics computed
IN THE SAME PASS as whatever action consumes the frame — no second
job, no extra scan, unlike a separate ``.count()`` / ``.agg()``
probe. At 100 TB a monitoring re-scan is a real cost; CollectMetrics
is free (it rides the existing task results).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame, cols: Sequence[str], name: str = "quality"
) -> tuple[DataFrame, Observation]:
    """Attach row-count + per-column null-count metrics.

    Returns ``(instrumented_df, observation)``; read
    ``observation.get`` after any action on the returned frame. Null
    counts use SUM(CASE ...) so the metric row is a single fixed-width
    aggregate buffer regardless of column count.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null_{c}")
        )
    return df.observe(obs, *metrics), obs
