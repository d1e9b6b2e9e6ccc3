"""Generator (explode) helpers that dodge a Catalyst cost pathology.

``InferFiltersFromGenerate`` adds ``size(e) > 0 AND isnotnull(e)``
below every ``explode(e)`` / ``posexplode(e)``. When ``e`` is an
alias of an expensive expression (nested higher-order functions,
regexp tokenization, md5 chains), filter pushdown substitutes the
WHOLE subtree into the predicate and pushes it below upstream
projections — sometimes below a ``repartition`` — so the full
pipeline is re-evaluated per input row in interpreted mode (HOFs are
CodegenFallback) at the scan's low parallelism. Measured on the sf1
winnowing fingerprint stream (50k docs): 49.7 s with the inferred
filter vs 0.5 s without — a 100x tax.

The dodge: ``explode_outer`` / ``posexplode_outer`` are exempt from
the rule (outer generators preserve empty-array rows, so no filter
can be inferred), and filtering the generated OUTPUT attribute
afterwards cannot be pushed below the generator. Output equals plain
``explode`` exactly as long as array ELEMENTS are non-null (outer
explode of an empty/null array emits one all-null row, which the
filter drops); use the pos variant when elements may be null.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exploded(df: DataFrame, cols: list, expr, alias: str) -> DataFrame:
    """``df.select(*cols, explode(expr).alias(alias))`` without the
    inferred-filter duplication.

    CONSTRAINT (ADVICE r3): array ELEMENTS must be non-null — unlike
    plain ``explode``, which emits a row with a null value for a null
    element, this helper SILENTLY DROPS null elements (the isNotNull
    filter on the output attribute cannot distinguish a null element
    from the padded empty-array row).  If the array can contain null
    elements, use :func:`pos_exploded`, which filters on the position
    and so keeps null-valued rows exactly like plain ``posexplode``.
    """
    out = df.select(*cols, F.explode_outer(expr).alias(alias))
    return out.filter(F.col(alias).isNotNull())


def pos_exploded(
    df: DataFrame, cols: list, expr, pos_alias: str, val_alias: str
) -> DataFrame:
    """``posexplode`` variant; null-element-safe (filters on the
    position, which is null only for the padded empty-array row)."""
    out = df.select(
        *cols, F.posexplode_outer(expr).alias(pos_alias, val_alias)
    )
    return out.filter(F.col(pos_alias).isNotNull())
