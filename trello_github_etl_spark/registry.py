"""Central query registry: name → builder, name → DuckDB oracle SQL.

Every operator the engine implements registers here via the
``@query`` decorator; ``__spark_entry__.py`` re-exports the two dicts
to the driver. An entry without an oracle gets the driver's weaker
rows-only check (reserved for genuinely non-SQL-expressible ops).

Determinism contract for oracle-checked queries (the driver hashes
values order-insensitively but exactly):
- FP aggregates go through exact DECIMAL sums cast back to DOUBLE on
  BOTH sides, so Spark and DuckDB produce bit-identical doubles
  regardless of summation order.
- Every group-concat / collect is explicitly ordered with a unique
  tie-break key.
- Top-k queries totally order their sort (unique key last).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from trello_github_etl_spark.queries import (  # noqa: F401
        advanced_q,
        board_q,
        cdc_q,
        ivm_q,
        llm_q,
        multimodal_q,
        owners_q,
        pipeline_q,
        profile_q,
        relational,
        relational_ext,
        scalar,
        skew_q,
        sql_q,
        stats_q,
        tpch_ext_q,
        tpch_q,
        windows_q,
    )
