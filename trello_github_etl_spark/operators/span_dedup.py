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
from pyspark.sql.window import Window

TILE_WORDS = 8

# dd33's sliding-window width (Lee et al. 2021 use 50 BPE tokens on
# real crawls; 8 words matches this corpus's ~54-word docs the same
# way TILE_WORDS does for dd28). Single-homed: the dd33 oracle and
# the skew gate derive from this constant.
KGRAM_WORDS = 8


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


def kgram_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    toks_col: str = "_tk",
    k: int = KGRAM_WORDS,
) -> DataFrame:
    """(id, pos, kgram_key) — one row per SLIDING KGRAM_WORDS-word
    window (stride 1, vs tile_spans' stride TILE_WORDS): position
    pos covers tokens [pos, pos+KGRAM_WORDS). Docs with fewer than
    KGRAM_WORDS tokens contribute no rows. The HOF emits only
    (pos, gram text); md5 is applied after the explode (lambda
    bodies get no subexpression elimination — SCALE.md lesson 38)."""
    n = F.size(toks_col)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.struct(
            i.alias("pos"),
            F.array_join(
                F.slice(F.col(toks_col), i + 1, k), " "
            ).alias("gram"),
        ),
    )
    return (
        docs.filter(n >= k)
        .select(id_col, F.explode(grams).alias("g"))
        .select(
            id_col,
            F.col("g.pos").cast("long").alias("pos"),
            F.md5(F.col("g.gram")).alias("kgram_key"),
        )
    )


def repeated_kgram_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    toks_col: str = "_tk",
    k: int = KGRAM_WORDS,
) -> DataFrame:
    """Corpus-wide repeated-substring spans, the distributed shape of
    Lee et al. 2021's suffix-array ExactSubstr dedup ("Deduplicating
    Training Data Makes Language Models Better"): find every maximal
    token span that occurs (anywhere — another doc OR the same doc)
    at least twice, WITHOUT ever materializing doc pairs. dd28 tiles
    at stride TILE_WORDS and so misses duplicates at shifted
    alignments; the sliding k-gram posting list catches any repeated
    run >= KGRAM_WORDS tokens at any offset, which is exactly what a
    suffix array buys, re-expressed as three relational steps:

      1. posting list: one row per sliding k-gram (linear in corpus
         tokens, ~n rows per n-token doc);
      2. repeated keys: groupBy(kgram_key) HAVING count >= 2 — the
         map-side-combined occurrence count stands in for the
         suffix-array LCP test; the postings->repeated equi-join
         shuffles on the md5-uniform key (hot boilerplate k-grams
         are the AQE skew-join case, and they are precisely the rows
         this operator exists to find — no df cap, heavy keys are
         signal not noise);
      3. maximal spans: per doc, overlapping-or-abutting marked
         windows merge via gaps-and-islands (lag + running sum over
         a window PARTITIONED BY doc id — bounded by doc length,
         never a global sort).

    Returns one row per doc that contains >= 1 repeated k-gram:
    (id, n_marked sliding windows, n_spans maximal spans, dup_tokens
    covered by those spans, span_fp = md5 of the ordered
    'start:end' half-open token ranges)."""
    # pin: postings feed BOTH the occurrence count and the marked
    # join (same two-consumer shape as span_dedup's tiles pin;
    # lifetime note there applies — multi-query drivers clearCache
    # between queries).
    post = kgram_postings(docs, id_col, toks_col, k).persist()
    rep = (
        post.groupBy("kgram_key")
        .agg(F.count("*").alias("_occ"))
        .filter(F.col("_occ") >= 2)
        .select("kgram_key")
    )
    marked = post.join(rep, "kgram_key").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    lagp = F.lag("pos").over(w)
    # two selects because lag and the running sum cannot nest in one
    # expression; both windows share (partition, order) so they plan
    # as ONE Window node over one hash exchange on the doc id
    flagged = marked.withColumn(
        "_new",
        F.when(
            lagp.isNull() | (F.col("pos") > lagp + k), 1
        ).otherwise(0),
    )
    isl = flagged.withColumn(
        "_isl",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_island = isl.groupBy(id_col, "_isl").agg(
        F.min("pos").alias("start"),
        (F.max("pos") + k).alias("spanend"),
        F.count("*").alias("_n_pos"),
    )
    spans_str = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("start", "spanend"))),
            lambda s: F.concat_ws(
                ":",
                s["start"].cast("string"),
                s["spanend"].cast("string"),
            ),
        ),
        ";",
    )
    return per_island.groupBy(id_col).agg(
        F.sum("_n_pos").alias("n_marked"),
        F.count("*").alias("n_spans"),
        F.sum(F.col("spanend") - F.col("start")).alias("dup_tokens"),
        F.md5(spans_str).alias("span_fp"),
    )
