"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001;
``queries()``/``oracle_sql()`` expose the full operator registry of
``trello_github_etl_spark`` (one entry per implemented operator from
SURVEY.md §2, verified against DuckDB oracles at sf0.01).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from trello_github_etl_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: quickview-report analog (SURVEY.md §2.8 Pipeline 2).

    Filter active orders → broadcast dim joins → derived columns →
    ordered per-group markdown aggregation.
    """
    registry.load_all()
    return registry.QUERIES["a1_order_markdown_checklist"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    registry.load_all()
    return dict(registry.ORACLES)
