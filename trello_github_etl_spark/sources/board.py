"""Trello board-export source: schema, reader, normalizer.

The reference loads one nested JSON document (etl.js:420,
lib/transform.js:9) and traverses it imperatively. Here the board
becomes a set of normalized DataFrames: entity collections explode
into `cards`, `checklists`, `check_items`, plus the small dimensions
(`lists`, `members`, `labels`, `custom_fields`).

Schema is explicit (README.md:252–421 canonical records) — the
100 TB-safe choice over inference; unknown extra JSON keys are
ignored by the reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# --- element schemas -------------------------------------------------------

LABEL = StructType(
    [
        StructField("id", StringType()),
        StructField("idBoard", StringType()),
        StructField("name", StringType()),
        StructField("color", StringType()),
    ]
)

# EAV custom-field item; `value` is a heterogeneous union {text}|{checked}
# (README.md:355–383) → struct with all-nullable branches.
CUSTOM_FIELD_ITEM = StructType(
    [
        StructField("id", StringType()),
        StructField(
            "value",
            StructType(
                [
                    StructField("text", StringType()),
                    StructField("checked", StringType()),
                    StructField("number", StringType()),
                ]
            ),
        ),
        StructField("idCustomField", StringType()),
        StructField("idModel", StringType()),
        StructField("modelType", StringType()),
    ]
)

CHECK_ITEM = StructType(
    [
        StructField("id", StringType()),
        StructField("idChecklist", StringType()),
        StructField("name", StringType()),
        StructField("state", StringType()),  # complete | incomplete
        StructField("pos", DoubleType()),
        StructField("due", StringType()),
        StructField("idMember", StringType()),
    ]
)

CHECKLIST = StructType(
    [
        StructField("id", StringType()),
        StructField("name", StringType()),
        StructField("idCard", StringType()),
        StructField("idBoard", StringType()),
        StructField("pos", DoubleType()),
        StructField("checkItems", ArrayType(CHECK_ITEM)),
    ]
)

BADGES = StructType(
    [
        StructField("checkItems", LongType()),
        StructField("checkItemsChecked", LongType()),
        StructField("comments", LongType()),
        StructField("attachments", LongType()),
        StructField("due", StringType()),
        StructField("dueComplete", BooleanType()),
    ]
)

CARD = StructType(
    [
        StructField("id", StringType()),
        StructField("name", StringType()),
        StructField("desc", StringType()),
        StructField("closed", BooleanType()),
        StructField("idBoard", StringType()),
        StructField("idList", StringType()),
        StructField("idShort", LongType()),
        StructField("pos", DoubleType()),
        StructField("due", StringType()),
        StructField("dueComplete", BooleanType()),
        StructField("dateLastActivity", StringType()),
        StructField("url", StringType()),
        StructField("shortUrl", StringType()),
        StructField("idMembers", ArrayType(StringType())),
        StructField("idLabels", ArrayType(StringType())),
        StructField("idChecklists", ArrayType(StringType())),
        StructField("labels", ArrayType(LABEL)),
        StructField("customFieldItems", ArrayType(CUSTOM_FIELD_ITEM)),
        StructField("badges", BADGES),
        # old-format boards nest checklists inside cards
        StructField("checklists", ArrayType(CHECKLIST)),
    ]
)

MEMBER = StructType(
    [
        StructField("id", StringType()),
        StructField("username", StringType()),
        StructField("fullName", StringType()),
    ]
)

LIST_ = StructType(
    [
        StructField("id", StringType()),
        StructField("name", StringType()),
        StructField("pos", DoubleType()),
        StructField("closed", BooleanType()),
    ]
)

CUSTOM_FIELD = StructType(
    [
        StructField("id", StringType()),
        StructField("name", StringType()),
        StructField("type", StringType()),
    ]
)

BOARD_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("name", StringType()),
        StructField("cards", ArrayType(CARD)),
        StructField("checklists", ArrayType(CHECKLIST)),  # new format: top-level
        StructField("lists", ArrayType(LIST_)),
        StructField("members", ArrayType(MEMBER)),
        StructField("labels", ArrayType(LABEL)),
        StructField("customFields", ArrayType(CUSTOM_FIELD)),
    ]
)


def read_board(spark: SparkSession, path: str) -> DataFrame:
    """S1: one nested JSON document per file (multiLine)."""
    return spark.read.schema(BOARD_SCHEMA).option("multiLine", "true").json(path)


def normalize_board(board: DataFrame) -> dict[str, DataFrame]:
    """Explode the board document into normalized entity DataFrames.

    Reconciles the two on-disk format versions (trelloBoardUpgrade,
    lib/transform.js:223–255): a card with a null `checklists` field is
    new-format and adopts the board-level checklists pointing at it; a
    card that carries its own (even empty ``[]``) keeps them and any
    top-level duplicates are dropped — exactly the reference's
    `_newChecklists` rule.
    """
    cards_raw = board.select(
        F.col("id").alias("board_id"), F.explode("cards").alias("c")
    )
    cards = cards_raw.select("board_id", "c.*")

    nested = (
        cards.filter(F.col("checklists").isNotNull())
        .select(F.explode("checklists").alias("cl"))
        .select("cl.*")
    )
    new_format_card_ids = cards.filter(F.col("checklists").isNull()).select(
        F.col("id").alias("_cid")
    )
    top_level = (
        board.filter(F.col("checklists").isNotNull())
        .select(F.explode("checklists").alias("cl"))
        .select("cl.*")
    )
    adopted = top_level.join(
        new_format_card_ids,
        top_level.idCard == new_format_card_ids._cid,
        "left_semi",
    )
    checklists = nested.unionByName(adopted)

    check_items = (
        checklists.select(
            F.col("id").alias("checklist_id"),
            F.col("idCard").alias("card_id"),
            F.col("name").alias("checklist_name"),
            F.col("pos").alias("checklist_pos"),
            F.explode_outer("checkItems").alias("it"),
        )
        .filter(F.col("it").isNotNull())
        .select("checklist_id", "card_id", "checklist_name", "checklist_pos", "it.*")
    )

    def dim(col: str) -> DataFrame:
        return board.select(F.explode(col).alias("d")).select("d.*")

    return {
        "cards": cards.drop("checklists"),
        "checklists": checklists.drop("checkItems"),
        "check_items": check_items,
        "lists": dim("lists"),
        "members": dim("members"),
        "board_labels": dim("labels"),
        "custom_fields": dim("customFields"),
    }
