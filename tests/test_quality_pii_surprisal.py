"""Unit tests for the round-9 corpus-filter operators: Gopher-style
quality rules, PII scrubbing, unigram-surprisal bucketing, and the
distributed exact ntile underneath it."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from trello_github_etl_spark.operators import pii, quality_rules as qr
from trello_github_etl_spark.operators.ranking import with_global_ntile
from trello_github_etl_spark.operators.surprisal import unigram_surprisal
from trello_github_etl_spark.operators.textstats import tokens


def _rules_row(spark, text: str) -> dict:
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    shared = df.select("doc_id", "text", tokens(F.col("text")).alias("_tk"))
    rules = qr.gopher_rules(F.col("_tk"), F.col("text"))
    out = shared.select(
        *[rules[c].alias(c) for c in qr.RULE_COLS],
        rules["keep"].alias("keep"),
    ).first()
    return out.asDict()


def test_gopher_rules_golden_boundaries(spark):
    ok = " ".join(["the", "be", "of", "and"] * 15)  # 60 words, mean len 2.6?
    # mean word length of the/be/of/and = (3+2+2+3)/4 = 2.5 < 3 -> fails
    r = _rules_row(spark, ok)
    assert r["r_word_count"] and r["r_stop"] and not r["r_mean_len"]
    assert not r["keep"]

    good = " ".join(["the", "cat", "sat", "with", "that", "dog"] * 10)
    r = _rules_row(spark, good)  # 60 words, mean (3+3+3+4+4+3)/6 = 3.33
    assert all(r[c] for c in qr.RULE_COLS) and r["keep"]

    short = "the cat sat with that dog"
    r = _rules_row(spark, short)
    assert not r["r_word_count"] and not r["keep"]


def test_gopher_line_and_symbol_rules(spark):
    base = " ".join(["the", "cat", "sat", "with", "that", "dog"] * 10)
    bullets = "\n".join("- item the cat" for _ in range(10))
    r = _rules_row(spark, bullets)
    assert not r["r_bullet"]  # 10/10 bullet lines > 0.9

    ell = base + "\n" + "\n".join("more..." for _ in range(9))
    r = _rules_row(spark, ell)  # 9/10 ellipsis lines > 0.3
    assert not r["r_ellipsis"]

    symbols = base + " " + "# " * 20  # 20 symbols / 60 words > 0.1
    r = _rules_row(spark, symbols)
    assert not r["r_symbol"]

    r = _rules_row(spark, "")
    assert not r["keep"] and not r["r_word_count"]


def test_pii_scrub_plants_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.co and c.d+x@e-f.org here"),
            (2, "host 10.0.0.1 and 192.168.255.3"),
            (3, "call 555-0134 or 555-0199"),
            (4, "clean text no pii"),
            (5, "mixed a@b.io at 10.1.2.3 dial 555-0000"),
        ],
        "doc_id long, text string",
    )
    cols = pii.scrub_pii(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *[cols[c].alias(c) for c in ("n_emails", "n_ips", "n_phones")],
            cols["scrubbed"].alias("scrubbed"),
        ).collect()
    }
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (2, 0, 0)
    assert "<EMAIL>" in out[1]["scrubbed"] and "@" not in out[1]["scrubbed"]
    assert (out[2]["n_ips"], out[2]["n_emails"]) == (2, 0)
    assert out[2]["scrubbed"] == "host <IP> and <IP>"
    assert out[3]["n_phones"] == 2
    assert out[3]["scrubbed"] == "call <PHONE> or <PHONE>"
    assert (out[4]["n_emails"], out[4]["n_ips"], out[4]["n_phones"]) == (0, 0, 0)
    assert out[4]["scrubbed"] == "clean text no pii"
    assert (out[5]["n_emails"], out[5]["n_ips"], out[5]["n_phones"]) == (1, 1, 1)
    assert out[5]["scrubbed"] == "mixed <EMAIL> at <IP> dial <PHONE>"


def test_pii_email_scrubbed_before_ip_and_phone(spark):
    # digits inside an email must be consumed by the email pass, not
    # half-eaten by the later numeric patterns
    df = spark.createDataFrame(
        [(1, "u123-4567@ex.com")], "doc_id long, text string"
    )
    cols = pii.scrub_pii(F.col("text"))
    row = df.select(
        cols["n_emails"].alias("e"),
        cols["n_phones"].alias("p"),
        cols["scrubbed"].alias("s"),
    ).first()
    assert (row["e"], row["p"], row["s"]) == (1, 0, "<EMAIL>")


def test_unigram_surprisal_hand_model(spark):
    # corpus: 'aa' x6, 'bb' x2  -> total 8 tokens
    # s(aa) = len(bin(8 // 6 = 1)) = 1 ; s(bb) = len(bin(8 // 2 = 4)) = 3
    df = spark.createDataFrame(
        [
            (1, "aa aa aa"),        # sum 3, n 3, avg 1.0
            (2, "aa bb"),           # sum 4, n 2, avg 2.0
            (3, "bb aa aa aa"),     # sum 6, n 4, avg 1.5
        ],
        "doc_id long, text string",
    )
    shared = df.select("doc_id", tokens(F.col("text")).alias("_tk"))
    out = {
        r["doc_id"]: r
        for r in unigram_surprisal(shared).collect()
    }
    assert out[1]["sum_surprisal"] == 3 and out[1]["n_scored"] == 3
    assert out[2]["sum_surprisal"] == 4
    assert out[3]["sum_surprisal"] == 6
    # avg_surprisal is internal-only since r13 (VERDICT r12 #1: raw
    # doubles are kept off the hashed output); the average is the
    # exact integer pair
    assert out[3]["sum_surprisal"] / out[3]["n_scored"] == 1.5
    assert "avg_surprisal" not in out[3].asDict()
    # bucket order follows avg: doc1 (1.0) < doc3 (1.5) < doc2 (2.0)
    assert out[1]["ppl_bucket"] < out[3]["ppl_bucket"] < out[2]["ppl_bucket"]


def test_stupid_backoff_hand_model(spark):
    from trello_github_etl_spark.operators.surprisal import (
        bigram_pairs,
        stupid_backoff_surprisal,
    )

    # train = even ids: doc0 'a b a b a', doc2 'a a'
    #   N = 7; c1(a)=5, c1(b)=2; c2(ab)=2, c2(ba)=2, c2(aa)=1
    # scoring: all four docs; doc3 is single-token (drops — no bigram)
    df = spark.createDataFrame(
        [(0, "a b a b a"), (1, "a b c a"), (2, "a a"), (3, "b")],
        "doc_id long, text string",
    )
    shared = df.select("doc_id", tokens(F.col("text")).alias("tk"))
    train = shared.filter(F.col("doc_id") % 2 == 0)
    out = {
        r["doc_id"]: r
        for r in stupid_backoff_surprisal(shared, train).collect()
    }
    assert set(out) == {0, 1, 2}  # doc3 dropped
    # doc0: ab,ba,ab,ba -> bits(5//2)=2, bits(2//2)=1 each pair
    assert out[0]["sum_surprisal"] == 6 and out[0]["n_backoff"] == 0
    # doc1: ab seen (2); bc -> w2 'c' UNSEEN word: 2+bits(7)=5;
    #       ca -> bigram unseen, w2 'a' seen: 2+bits(7//5)=3
    assert out[1]["sum_surprisal"] == 10
    assert out[1]["n_bigrams"] == 3 and out[1]["n_backoff"] == 2
    # doc2: aa -> bits(5//1)=3
    assert out[2]["sum_surprisal"] == 3 and out[2]["n_backoff"] == 0
    assert math.isclose(out[1]["avg_surprisal"], 10 / 3)
    # bucket order follows avg: doc0 (1.5) < doc2 (3.0) < doc1 (3.33)
    assert out[0]["ppl_bucket"] < out[2]["ppl_bucket"] < out[1]["ppl_bucket"]
    # sequence(1, size-1) guard: a one-token doc yields NO pairs (an
    # unguarded descending sequence(1, 0) would fabricate two)
    assert bigram_pairs(shared).filter(F.col("doc_id") == 3).count() == 0


def test_global_ntile_matches_sql_window(spark):
    # 103 rows, 10 buckets: sizes 11x3 + 10x7, larger buckets first
    df = spark.range(103).select(
        F.col("id"), (F.col("id") * 37 % 103).alias("key")
    )
    got = {
        r["id"]: r["b"]
        for r in with_global_ntile(
            df, 10, "key", ["id"], out_col="b"
        ).collect()
    }
    df.createOrReplaceTempView("t_ntile")
    want = {
        r["id"]: r["b"]
        for r in spark.sql(
            "SELECT id, ntile(10) OVER (ORDER BY key, id) AS b FROM t_ntile"
        ).collect()
    }
    assert got == want


def test_global_ntile_single_bucket_and_fewer_rows_than_buckets(spark):
    df = spark.range(3).select(F.col("id"))
    got = sorted(
        r["b"]
        for r in with_global_ntile(df, 10, "id", [], "b").collect()
    )
    assert got == [1, 2, 3]  # standard ntile: one row per leading bucket
    got1 = {
        r["b"] for r in with_global_ntile(df, 1, "id", [], "b").collect()
    }
    assert got1 == {1}


def test_global_ntile_all_equal_keys_degenerate_bucket(spark):
    # span == 0: every row lands in value-bucket 0; ranks still exact
    df = spark.range(7).select(F.col("id"), F.lit(5.0).alias("key"))
    got = sorted(
        (r["id"], r["b"])
        for r in with_global_ntile(df, 3, "key", ["id"], "b").collect()
    )
    assert got == [(0, 1), (1, 1), (2, 1), (3, 2), (4, 2), (5, 3), (6, 3)]


def test_span_dedup_strips_boilerplate_keeps_first(spark):
    from trello_github_etl_spark.operators.span_dedup import (
        TILE_WORDS,
        span_dedup,
    )

    boiler = " ".join(f"b{i}" for i in range(TILE_WORDS))
    uniq = lambda d: " ".join(f"u{d}x{i}" for i in range(TILE_WORDS))  # noqa: E731
    df = spark.createDataFrame(
        [
            (1, boiler + " " + uniq(1)),          # first occurrence: kept
            (2, boiler + " " + uniq(2)),          # boiler tile dropped
            (3, uniq(3) + " " + boiler),          # boiler tile dropped
            (4, boiler),                          # whole doc dropped
            (5, "short tail"),                    # single remainder tile
        ],
        "doc_id long, text string",
    )
    shared = df.select("doc_id", tokens(F.col("text")).alias("_tk"))
    out = {r["doc_id"]: r for r in span_dedup(shared).collect()}
    assert (out[1]["n_tiles"], out[1]["n_dropped"]) == (2, 0)
    assert (out[2]["n_tiles"], out[2]["n_dropped"]) == (2, 1)
    assert (out[3]["n_tiles"], out[3]["n_dropped"]) == (2, 1)
    assert (out[4]["n_tiles"], out[4]["n_dropped"]) == (1, 1)
    assert out[4]["cleaned_len"] == 0  # fully-deduped doc -> empty
    assert (out[5]["n_tiles"], out[5]["n_dropped"]) == (1, 0)
    # doc 2's cleaned text is exactly its unique tile
    import hashlib

    assert out[2]["cleaned_fp"] == hashlib.md5(
        uniq(2).encode()
    ).hexdigest()
    # within-doc repeat: second occurrence drops even inside one doc
    rep = spark.createDataFrame(
        [(9, boiler + " " + boiler)], "doc_id long, text string"
    ).select("doc_id", tokens(F.col("text")).alias("_tk"))
    r9 = span_dedup(rep).collect()[0]
    assert (r9["n_tiles"], r9["n_dropped"]) == (2, 1)


def test_containment_catches_quote_inclusion_jaccard_misses(spark):
    from trello_github_etl_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    short = " ".join(f"q{i}" for i in range(6))  # 4 shingles
    longdoc = short + " " + " ".join(f"z{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, short, "en"), (2, longdoc, "en"), (3, "other words entirely here", "en")],
        "doc_id long, text string, lang string",
    )
    cont = containment_pairs(df, threshold=0.9).collect()
    assert len(cont) == 1
    row = cont[0]
    assert (row["doc_a"], row["doc_b"]) == (1, 2)
    assert row["c_ab"] == 1.0 and row["c_ba"] < 0.2
    # symmetric jaccard at the same strictness never sees the pair
    assert jaccard_pairs(df, threshold=0.9).count() == 0


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(st.integers(-100, 100), min_size=1, max_size=60),
    n_buckets=st.integers(1, 12),
)
def test_global_ntile_property_matches_sql_window(spark, keys, n_buckets):
    # duplicate keys allowed — id is the tie-break; the integer
    # bucket formula must match ntile() for every (C, N) split shape
    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "id long, key long"
    )
    got = {
        r["id"]: r["b"]
        for r in with_global_ntile(
            df, n_buckets, "key", ["id"], out_col="b"
        ).collect()
    }
    df.createOrReplaceTempView("t_ntile_prop")
    want = {
        r["id"]: r["b"]
        for r in spark.sql(
            f"SELECT id, ntile({n_buckets}) OVER (ORDER BY key, id) AS b "
            "FROM t_ntile_prop"
        ).collect()
    }
    assert got == want


def test_containment_df_cap_bounds_hot_shingle_candidates(spark):
    from trello_github_etl_spark.operators.dedup import containment_pairs

    # 30 docs all sharing one hot 3-shingle ("x y z"), each with a
    # distinct remainder: uncapped, the hot shingle alone generates
    # 435 candidate pairs; capped at df<=5 it generates none, and the
    # two planted true containments (doc 100 inside 101, which share
    # RARE shingles too) survive because rare-shingle candidates are
    # untouched — the cap drops candidate GENERATION, not scoring
    base = [(i, "x y z " + " ".join(f"w{i}n{j}" for j in range(6)), "en")
            for i in range(30)]
    quote = " ".join(f"q{j}" for j in range(8))
    base.append((100, quote, "en"))
    base.append((101, quote + " " + " ".join(f"t{j}" for j in range(40)), "en"))
    df = spark.createDataFrame(base, "doc_id long, text string, lang string")
    capped = containment_pairs(df, threshold=0.9, max_shingle_df=5).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in capped] == [(100, 101)]
    assert capped[0]["c_ab"] == 1.0
    uncapped = containment_pairs(df, threshold=0.0).count()
    assert uncapped >= 435  # the hot shingle's full pair expansion


def test_global_rank_rejects_null_and_nan_keys(spark):
    # r9 advice: a NULL/NaN key would land in bucket 0 (greatest()
    # skips nulls) yet sort NULL-first/NaN-last inside the bucket —
    # a silent bucket-monotone break. The operator must raise, not
    # misrank.
    import pytest

    from trello_github_etl_spark.operators.ranking import with_global_rank

    null_df = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, None)], "id long, key double"
    )
    with pytest.raises(Exception, match="NULL/NaN"):
        with_global_rank(null_df, "key", ["id"]).collect()
    nan_df = spark.createDataFrame(
        [(0, 1.0), (1, float("nan"))], "id long, key double"
    )
    with pytest.raises(Exception, match="NULL/NaN"):
        with_global_rank(nan_df, "key", ["id"]).collect()
    # the degenerate repeated-key + NULL corpus: span == 0, so a
    # guard living only in the nonzero-span branch would hand the
    # NULL row bucket 0 silently — this shape must raise too
    deg_df = spark.createDataFrame(
        [(0, 5.0), (1, 5.0), (2, None)], "id long, key double"
    )
    with pytest.raises(Exception, match="NULL/NaN"):
        with_global_rank(deg_df, "key", ["id"]).collect()
    spark.catalog.clearCache()  # drop the pins the failed runs left
