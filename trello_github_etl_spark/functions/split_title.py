"""Pandas-UDF reference implementation of the F3 title splitter.

`text.split_title_desc` is the production path (native JVM
higher-order fold). This Arrow-batched UDF is a line-by-line
transliteration of the reference loop's *semantics*
(lib/transform.js:43–60) used to cross-check the native closed form
in tests (including Hypothesis property tests). Keep both in sync.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from trello_github_etl_spark.functions.text import TITLE_MAX

SPLIT_SCHEMA = StructType(
    [
        StructField("title", StringType()),
        StructField("desc", StringType()),
    ]
)


def split_title_desc_py(name: str) -> tuple[str, str]:
    """Plain-Python splitter: greedy 50-char word accumulator."""
    words = re.split(r"\s", name)
    title = ""
    desc = ""
    for w in words:
        if desc:
            desc += f"{w} "
            continue
        if len(title) < TITLE_MAX:
            title += f"{w} "
            continue
        title = title.strip() + "..."
        desc += f"{w} "
    desc = desc.strip()
    return title, desc


@F.pandas_udf(SPLIT_SCHEMA)
def split_title_desc_udf(names: pd.Series) -> pd.DataFrame:
    parts = [split_title_desc_py(n if n is not None else "") for n in names]
    return pd.DataFrame(parts, columns=["title", "desc"], index=names.index)
