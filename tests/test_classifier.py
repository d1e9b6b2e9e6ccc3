"""Unit tests for the hashed linear classifier (operators/
classifier.py): hand-computed md5 oracle, collision weight sharing,
zero-feature docs, and the scan-fused plan shape."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from trello_github_etl_spark.operators import classifier


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _weight_of(gram: str) -> int:
    bucket = _h60(gram) % classifier.HASH_BUCKETS
    return _h60(str(bucket)) % classifier.WEIGHT_SPAN - 1024


def test_hand_computed_score(spark):
    text = "alpha beta gamma"
    want = _weight_of("alpha beta") + _weight_of("beta gamma")
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    from trello_github_etl_spark.operators.textstats import tokens

    shared = df.select("doc_id", tokens(F.col("text")).alias("_tk"))
    cols = classifier.classifier_cols(F.col("_tk"))
    row = shared.select(
        cols["n_feats"].alias("n"),
        cols["score"].alias("s"),
        cols["avg_score"].alias("a"),
    ).first()
    assert row["n"] == 2
    assert row["s"] == want
    assert row["a"] == want / 2


def test_colliding_buckets_share_weights(spark):
    # brute-force two DIFFERENT bigrams whose h60 lands in the same
    # bucket — the hashing-trick property: they must score the same
    base = "w0 x"
    target = _h60(base) % classifier.HASH_BUCKETS
    other = None
    for i in range(1, 2_000_000):
        cand = f"w{i} x"
        if _h60(cand) % classifier.HASH_BUCKETS == target:
            other = cand
            break
    assert other is not None, "no collision found in search budget"
    df = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id long, text string"
    )
    from trello_github_etl_spark.operators.textstats import tokens

    shared = df.select("doc_id", tokens(F.col("text")).alias("_tk"))
    cols = classifier.classifier_cols(F.col("_tk"))
    rows = {
        r["doc_id"]: r["s"]
        for r in shared.select("doc_id", cols["score"].alias("s")).collect()
    }
    assert rows[1] == rows[2]


def test_zero_feature_docs_score_zero(spark):
    # 0 and 1 token docs have no bigrams: n_feats 0, score 0, avg 0.0
    df = spark.createDataFrame(
        [(1, ""), (2, "solo")], "doc_id long, text string"
    )
    from trello_github_etl_spark.operators.textstats import tokens

    shared = df.select("doc_id", tokens(F.col("text")).alias("_tk"))
    out = {
        r["doc_id"]: r
        for r in classifier.score_documents(shared).collect()
    }
    for d in (1, 2):
        assert out[d]["n_feats"] == 0
        assert out[d]["score"] == 0
        assert out[d]["avg_score"] == 0.0
