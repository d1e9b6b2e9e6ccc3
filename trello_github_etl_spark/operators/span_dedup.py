"""Corpus-wide duplicate-span removal (C4-style, Raffel et al. 2020
§2.2: "we removed any duplicated three-sentence spans from the
dataset", keeping one occurrence). The third dedup granularity the
pipeline needs between exact-doc (dd1) and near-doc (dd3): boiler-
plate paragraphs repeated across pages survive doc-level dedup and
poison training; span dedup strips them everywhere but their first
occurrence.

Spans here are fixed word TILES (TILE_WORDS words, stride
TILE_WORDS, remainder tile kept) rather than sentence triples — the
synthetic corpus carries no sentence punctuation, and a fixed tile
keeps reconstruction exact and oracle-checkable. The semantics are
identical in shape: hash every tile, elect the global first
occurrence per tile hash (min (doc_id, tile_idx) — within-doc
repeats drop too), rebuild each doc from its kept tiles in order.

Scale shape: tiles explode narrowly off the token projection
(ceil(n/TILE) rows per doc), ONE groupBy(tile_key) shuffle elects
keepers, the tiles->keepers equi-join shuffles on the same
md5-uniform key (AQE handles the hot boilerplate keys — a tile
repeated millions of times is exactly the skew-join case), and the
per-doc rebuild is a groupBy(doc_id) with an order-insensitive
collect + array_sort, so no within-group sort shuffle. No driver
collects, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TILE_WORDS = 8


def tile_spans(
    docs: DataFrame, id_col: str = "doc_id", toks_col: str = "_tk"
) -> DataFrame:
    """(id, tile_idx, tile_key) — one row per TILE_WORDS-word tile
    (stride TILE_WORDS; the remainder tile is kept). Docs with zero
    tokens contribute no rows."""
    n = F.size(toks_col)
    n_tiles = F.ceil(n.cast("double") / TILE_WORDS).cast("int")
    # the HOF emits ONLY (tile_idx, tile_text): lambda bodies get no
    # subexpression elimination (SCALE.md lesson 38), so computing
    # md5(join(slice(...))) alongside join(slice(...)) would run the
    # slice+join twice per tile in the hottest corpus-wide map — the
    # key is derived from the projected text after the explode
    tiles = F.transform(
        F.sequence(F.lit(0), n_tiles - 1),
        lambda i: F.struct(
            i.alias("tile_idx"),
            F.array_join(
                F.slice(F.col(toks_col), i * TILE_WORDS + 1, TILE_WORDS),
                " ",
            ).alias("tile_text"),
        ),
    )
    return (
        docs.filter(n > 0)
        .select(id_col, F.explode(tiles).alias("t"))
        .select(
            id_col,
            "t.tile_idx",
            F.md5(F.col("t.tile_text")).alias("tile_key"),
            "t.tile_text",
        )
    )


def span_dedup(
    docs: DataFrame, id_col: str = "doc_id", toks_col: str = "_tk"
) -> DataFrame:
    """(id, n_tiles, n_dropped, cleaned_fp, cleaned_len) per doc with
    >= 1 token: every tile whose (doc_id, tile_idx) is not the
    corpus-global minimum for its hash is dropped; cleaned_fp/len
    fingerprint the doc rebuilt from kept tiles in order (md5 and
    length travel instead of the text so the output stays
    driver-hashable and small)."""
    # pin: tiles feeds BOTH the keeper election and the marked join,
    # two pruned subtrees that are not exchange-identical — unpinned,
    # the tokenize+tile Generate runs twice (persist, not
    # localCheckpoint: lineage-preserving, same trade as
    # dedup.minhash_lsh_pairs' banded pin). Lifetime: the SQL
    # CacheManager holds this until unpersist/clearCache (NOT
    # GC-reclaimed) — multi-query drivers clear between queries; see
    # the banded pin's comment in dedup.py for the full story.
    tiles = tile_spans(docs, id_col, toks_col).persist()
    keepers = tiles.groupBy("tile_key").agg(
        F.min(F.struct(F.col(id_col), F.col("tile_idx"))).alias("_first")
    )
    marked = tiles.join(keepers, "tile_key").withColumn(
        "_keep",
        (F.col("_first")[id_col] == F.col(id_col))
        & (F.col("_first.tile_idx") == F.col("tile_idx")),
    )
    per_doc = marked.groupBy(id_col).agg(
        F.count("*").alias("n_tiles"),
        F.sum(F.when(~F.col("_keep"), 1).otherwise(0)).alias("n_dropped"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("_keep"),
                    F.struct("tile_idx", "tile_text"),
                )
            )
        ).alias("_kept"),
    )
    cleaned = F.array_join(
        F.transform(F.col("_kept"), lambda s: s["tile_text"]), " "
    )
    # project `cleaned` once, then fingerprint/measure the projected
    # column — md5(cleaned) and length(cleaned) side by side would
    # each re-run the transform+join (lesson 38 again)
    return per_doc.withColumn("_cleaned", cleaned).select(
        id_col,
        "n_tiles",
        "n_dropped",
        F.md5("_cleaned").alias("cleaned_fp"),
        F.length("_cleaned").alias("cleaned_len"),
    )
