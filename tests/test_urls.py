"""Golden canonicalization pairs for functions/urls.py (r9 VERDICT
#3) plus the dd31 provenance-dedup query's cluster semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from trello_github_etl_spark.functions.urls import canonicalize_url

# (raw, canonical) — one pair per rule plus composites
GOLDEN = [
    # scheme + host case-fold
    ("HTTP://Example.COM/a", "http://example.com/a"),
    # www strip
    ("https://WWW.Example.com/a", "https://example.com/a"),
    # default ports dropped, per scheme
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    # non-default port kept
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    # https:80 is NOT default — kept
    ("https://example.com:80/a", "https://example.com:80/a"),
    # fragment strip
    ("http://example.com/a#sec-2", "http://example.com/a"),
    # trailing slash strip; bare authority -> '/'
    ("http://example.com/a/b/", "http://example.com/a/b"),
    ("http://example.com/a///", "http://example.com/a"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/", "http://example.com/"),
    # tracking params dropped, survivors sorted
    (
        "http://example.com/a?utm_source=feed&id=7",
        "http://example.com/a?id=7",
    ),
    (
        "http://example.com/a?b=2&a=1",
        "http://example.com/a?a=1&b=2",
    ),
    (
        "http://example.com/a?gclid=g123&fbclid=f&msclkid=m&mc_eid=e&ref=r",
        "http://example.com/a",
    ),
    # anchored key match: href/prefs are NOT tracking params
    (
        "http://example.com/a?href=x&prefs=y",
        "http://example.com/a?href=x&prefs=y",
    ),
    # empty query / dangling '?' collapse
    ("http://example.com/a?", "http://example.com/a"),
    # everything at once
    (
        "HtTpS://WWW.Site4.COM:443/p/item2/?utm_campaign=x&id=9#frag",
        "https://site4.com/p/item2?id=9",
    ),
    # idempotence witness: canonical input unchanged
    ("https://site4.com/p/item2?id=9", "https://site4.com/p/item2?id=9"),
]


def test_golden_canonicalization_pairs(spark):
    df = spark.createDataFrame(
        [(i, raw, want) for i, (raw, want) in enumerate(GOLDEN)],
        "i long, raw string, want string",
    )
    rows = (
        df.withColumn("got", canonicalize_url(F.col("raw")))
        .orderBy("i")
        .collect()
    )
    for r in rows:
        assert r["got"] == r["want"], f"{r['raw']!r}: {r['got']!r} != {r['want']!r}"


def test_canonicalization_is_idempotent_on_goldens(spark):
    df = spark.createDataFrame(
        [(w,) for _, w in GOLDEN], "canon string"
    )
    rows = (
        df.withColumn("again", canonicalize_url(F.col("canon")))
        .collect()
    )
    for r in rows:
        assert r["again"] == r["canon"]


def test_dd31_clusters_and_keepers(spark):
    from trello_github_etl_spark.registry import QUERIES, load_all

    load_all()
    out = QUERIES["dd31_url_canonical_dedup"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) > 0
    by_canon: dict[str, list] = {}
    for r in out:
        by_canon.setdefault(r["canon_url"], []).append(r)
    for canon, members in by_canon.items():
        keeper = min(m["doc_id"] for m in members)
        for m in members:
            assert m["keeper_id"] == keeper
            assert m["verdict"] == (
                "kept" if m["doc_id"] == keeper else "dup_url"
            )
            # every member's raw URL canonicalizes to the group key
            assert m["canon_url"] == canon
    # the derivation plants real dup clusters: at least one canonical
    # URL must own >1 raw spelling
    assert any(len(m) > 1 for m in by_canon.values())
