"""Composite check-item parser: the full `parseChecklistItem` pipeline.

Reference: lib/transform.js:25–70 — strip index prefix, extract+strip
bounty, split title/desc at 50 chars, append bounty footer. All
native columns; one `select` produces every derived field.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from trello_github_etl_spark.functions import text


def parse_check_item(name: Column) -> Column:
    """name → struct<clean_name, amount, title, desc>.

    Mirrors the reference's mutation order: the index prefix is
    stripped before the bounty (so ``"1) task (1 Dash)"`` parses
    both), and the title split runs on the fully-stripped name.
    """
    no_prefix = text.strip_index_prefix(name)
    amount = text.extract_bounty_amount(no_prefix)
    clean = F.when(
        amount.isNull() & ~no_prefix.rlike(text.BOUNTY_RE),
        no_prefix,
    ).otherwise(text.strip_bounty(no_prefix))
    split = text.split_title_desc(clean)
    # NB: bracket access — `.desc` would resolve to Column.desc() (sort).
    desc = text.append_bounty_footer(split["desc"], amount)
    return F.struct(
        clean.alias("clean_name"),
        amount.alias("amount"),
        split["title"].alias("title"),
        desc.alias("desc"),
    )
