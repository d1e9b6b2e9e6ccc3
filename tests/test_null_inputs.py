"""Null-tolerance: text/embedding operators must treat NULL payloads
as absent data (dropped or null-propagated), never raise. Real
corpora at scale always carry nulls; these pin the contract."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T


def _docs(spark, rows):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_text_ops_on_null_text(spark):
    from trello_github_etl_spark.operators import dedup, textstats
    from pyspark.sql import functions as F

    docs = _docs(
        spark,
        [(1, "alpha beta gamma delta", "en"), (2, None, "en"), (3, "", "en")],
    )
    stats = docs.select(
        "doc_id",
        textstats.token_count(F.col("text")).alias("n"),
        textstats.quality_score(F.col("text")).alias("q"),
        textstats.fingerprint(F.col("text")).alias("fp"),
    ).collect()
    by_id = {r.doc_id: r for r in stats}
    assert by_id[1].n == 4
    # NULL text: counts/scores/fingerprints are NULL, not errors
    assert by_id[2].n is None and by_id[2].q is None and by_id[2].fp is None
    assert by_id[3].n == 0
    # dedup paths: null/empty docs simply produce no shingles/pairs
    assert dedup.jaccard_pairs(docs).count() == 0
    assert dedup.minhash_lsh_pairs(docs).count() == 0
    assert dedup.exact_duplicates(docs).count() == 0


def test_vector_ops_on_null_embedding(spark):
    from trello_github_etl_spark.operators import similarity

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 0.0])], schema
    )
    got = {r.vec_id: r for r in similarity.quantize_int8(vecs).collect()}
    assert got[1].qvec == [127, 0]
    # NULL vector: the scale CASE falls through to 0.0 (same branch
    # the oracle takes) and the code null-propagates — the NULL code
    # is what marks the row as absent downstream
    assert got[2].scale == 0.0 and got[2].qvec is None
    assert got[3].scale == 0.0 and got[3].qvec == [0, 0]


def test_round2_ops_on_null_text_and_ids(spark):
    """Null text must not crash the new operators: the fingerprint of
    NULL text is NULL (its own dedup group), token arrays of NULL are
    NULL → treated as empty by the adaptive ratio."""
    from trello_github_etl_spark.operators import dedup, textstats

    docs = spark.createDataFrame(
        [(1, "real text here"), (2, None), (3, None)],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame([("x",)], "fp string")
    verdicts = {
        r.doc_id: r.verdict
        for r in dedup.incremental_dedup(docs, corpus).collect()
    }
    assert verdicts[1] == "kept"
    # NULL-fp docs get their own verdict: an fp equi-join can never
    # match NULL across batches, so 'kept' would re-admit one per
    # batch forever — absent data is flagged, never admitted
    assert verdicts[2] == "no_text" and verdicts[3] == "no_text"

    toks = docs.select(
        "doc_id", textstats.tokens(F.col("text")).alias("tk")
    )
    ratios = {
        r.doc_id: r.top_element_ratio
        for r in textstats.top_element_ratio_adaptive(
            toks, "doc_id", "tk", threshold=1
        ).collect()
    }
    # null token arrays route to the marker path (coalesced size) and
    # surface as rows with NULL ratio — never silently dropped
    assert set(ratios) == {1, 2, 3}
    assert ratios[1] is not None
    assert ratios[2] is None and ratios[3] is None


def test_round4_text_ops_on_null_text(spark):
    """t15 readability and simhash Hamming pairing on NULL/empty
    text: null-propagate or contribute nothing, never raise."""
    from trello_github_etl_spark.operators import dedup, textstats

    docs = _docs(
        spark,
        [(1, "the quick brown fox. it jumps!", "en"), (2, None, "en"),
         (3, "", "en")],
    )
    rows = {
        r.doc_id: r
        for r in docs.select(
            "doc_id",
            textstats.sentence_count(F.col("text")).alias("s"),
            textstats.syllable_count(F.col("text")).alias("sy"),
            textstats.flesch_reading_ease(F.col("text")).alias("fl"),
        ).collect()
    }
    assert rows[1].s == 2 and rows[1].sy >= rows[1].s
    assert rows[2].s is None  # phantom-sentence guard (r4 review)
    assert rows[2].sy is None and rows[2].fl is None
    assert rows[3].sy == 0 and rows[3].fl is None
    # null text drops out of the signature stream entirely: no pair
    # can involve doc 2, and the call never raises
    pairs = dedup.simhash_hamming_pairs(docs, bits=60).collect()
    assert all(2 not in (r.doc_a, r.doc_b) for r in pairs)


def test_round5_ops_on_null_text_and_source(spark):
    """dd21 span coverage, dd22 keeper election, t16/samp7 source
    handling: NULL text contributes no n-grams/shingles (never
    raises, never pairs); NULL source counts as off-target for DSIR
    and groups as its own vocab-coverage row rather than vanishing."""
    import os

    import __spark_entry__ as entry
    from trello_github_etl_spark.operators import dedup

    phrase = " ".join(f"n{i}" for i in range(9))
    docs = _docs(
        spark, [(1, phrase, "en"), (2, phrase, "en"), (3, None, "en"), (4, "", "en")]
    )
    cov = {r.doc_id for r in dedup.repeated_ngram_coverage(docs).collect()}
    assert cov == {1, 2}
    keep = dedup.dup_cluster_keepers(docs).collect()
    assert all(r.keeper_id in (1, 2) for r in keep)
    # NULL source: t16 reports it as a group; samp7 treats it off-target
    rows = [(1, "alpha beta gamma delta", "en", None, 22),
            (2, "alpha beta gamma delta", "en", "src0", 22)]
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        sf = os.path.join(td, "sf")
        os.makedirs(sf)
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(sf, "documents.parquet"))
        t16 = entry.queries()["t16_vocab_coverage"](spark, sf).collect()
        assert {r.source for r in t16} == {None, "src0"}
        s7 = {r.doc_id: r for r in entry.queries()["samp7_dsir_importance"](spark, sf).collect()}
        # identical text: the null-source doc is raw-only, the src0 doc
        # target -- target doc must score at least as high
        assert s7[2].imp_mean >= s7[1].imp_mean
