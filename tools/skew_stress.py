"""Zipfian/skewed-corpus stress receipt (VERDICT r5 #3 / r6 #3).

Real corpora are not uniform: token frequencies are Zipfian, site
boilerplate plants the same n-gram in a large document fraction, and
crawl dedup routinely meets one giant duplicate family (a mirrored
page, a template). The driver's synthetic documents have none of
these, so this tool builds an sf1-SCALE corpus that does, runs the
skew-sensitive operators, asserts the advertised levers actually
engage, and writes SKEW_sf1.json:

- 50,000 docs × ~100 tokens, token ids drawn u³-skewed over a 30k
  vocab (Zipf-ish head concentration), fully deterministic
  (xxhash64 of the doc/position — no RNG state);
- a HOT 8-GRAM spliced mid-document into 20% of docs (10k-df
  boilerplate — the repeated-ngram / shingle-cap stressor);
- one 10,000-member EXACT-dup cluster (docs 40000..49999 share one
  text — the giant-band stressor: every LSH/simhash band collides).

Operators exercised and the levers asserted:
- minhash_lsh_pairs UNCAPPED: the O(d²) receipt (the 10k cluster is
  4 bands × C(10k,2) ≈ 200M joined rows before distinct);
- minhash_lsh_pairs(max_band_df=20): giant bands dropped pre-expansion;
- lsh_candidate_edges + connected_components_twostar +
  dup_cluster_keepers: the O(d) star path must recover the 10k
  cluster intact (n_members=10000, min-id keeper);
- simhash_hamming_pairs(max_band_df=HAMMING_BAND_DF): identical
  signatures → hot Hamming bands dropped by the dd17 cap;
- jaccard_pairs(max_shingle_df=10): the hot 8-gram's shingles (df
  10k) and the clone shingles dropped by the dd7 cap;
- repeated_ngram_coverage: the clone text is 100% repeated grams and
  the hot 8-gram pushes one gram to df 10k — per-group buffers stay
  linear (SCALE.md lesson 31).

Usage: python tools/skew_stress.py [--out SKEW_sf1.json]
       [--skip-uncapped]  (the uncapped pair receipt is the slow part)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from trello_github_etl_spark.operators import dedup  # noqa: E402
from trello_github_etl_spark.session import get_spark  # noqa: E402

N_DOCS = 50_000
DOC_TOKENS = 100
VOCAB = 30_000
HOT_FRACTION_MOD = 5  # doc_id % 5 == 1 → 20% of docs carry the hot 8-gram
HOT8 = "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8"
CLUSTER_START = 40_000  # docs 40000..49999 are one exact-dup family
CLUSTER_SIZE = 10_000


def build_corpus(spark):
    """Deterministic skewed corpus, generated JVM-side (no driver
    loop): u³-skewed token draw concentrates ~9% of all tokens on the
    single hottest word — Zipf-ish without needing a harmonic table."""
    base = spark.range(0, N_DOCS).select(F.col("id").alias("doc_id"))
    words = F.transform(
        F.sequence(F.lit(1), F.lit(DOC_TOKENS)),
        lambda i: F.concat(
            F.lit("w"),
            (
                F.pow(
                    F.pmod(
                        F.xxhash64(F.col("doc_id") * DOC_TOKENS + i),
                        F.lit(1_000_000),
                    )
                    / F.lit(1_000_000.0),
                    F.lit(3.0),
                )
                * VOCAB
            )
            .cast("int")
            .cast("string"),
        ),
    )
    text = F.array_join(words, " ")
    hot_text = F.concat(
        F.array_join(F.slice(words, 1, DOC_TOKENS // 2), " "),
        F.lit(" " + HOT8 + " "),
        F.array_join(F.slice(words, DOC_TOKENS // 2 + 1, DOC_TOKENS // 2), " "),
    )
    docs = base.select(
        "doc_id",
        F.when(F.col("doc_id") % HOT_FRACTION_MOD == 1, hot_text)
        .otherwise(text)
        .alias("text"),
    )
    # the exact-dup family: every doc >= CLUSTER_START gets the
    # CLUSTER_START doc's token stream (re-derived per row, so the
    # plan stays a single narrow pass — no join on a 1-row frame)
    clone_words = F.transform(
        F.sequence(F.lit(1), F.lit(DOC_TOKENS)),
        lambda i: F.concat(
            F.lit("w"),
            (
                F.pow(
                    F.pmod(
                        # cast to long: xxhash64 hashes int32 and int64
                        # inputs differently, and the background text
                        # hashes doc_id*DOC_TOKENS+i as LONG — without
                        # the cast the clone text would not be doc
                        # 40000's token stream (r7 code review)
                        F.xxhash64(
                            F.lit(CLUSTER_START * DOC_TOKENS).cast("long") + i
                        ),
                        F.lit(1_000_000),
                    )
                    / F.lit(1_000_000.0),
                    F.lit(3.0),
                )
                * VOCAB
            )
            .cast("int")
            .cast("string"),
        ),
    )
    docs = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") >= CLUSTER_START, F.array_join(clone_words, " ")
        )
        .otherwise(F.col("text"))
        .alias("text"),
        # jaccard_pairs blocks on lang; one block = the worst case for
        # the df cap, which is the point of the stress
        F.lit("en").alias("lang"),
    )
    return docs.repartition(32).localCheckpoint(eager=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(_REPO, "SKEW_sf1.json"))
    ap.add_argument("--skip-uncapped", action="store_true")
    args = ap.parse_args()

    spark = get_spark("skew_stress")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    docs = build_corpus(spark)
    n = docs.count()
    results: dict[str, dict] = {}
    results["_corpus"] = {
        "docs": n,
        "hot8_df": docs.filter(F.col("text").contains(HOT8)).count(),
        "cluster_size": CLUSTER_SIZE,
        "gen_secs": round(time.time() - t0, 2),
    }
    # 20% of the BACKGROUND corpus (the clone family overwrites the
    # hot slots above CLUSTER_START): 8,000 of 40,000
    assert results["_corpus"]["hot8_df"] >= int(
        (N_DOCS - CLUSTER_SIZE) * 0.19
    )
    print(f"corpus: {results['_corpus']}", flush=True)

    def run(name: str, thunk, **extra) -> dict:
        t0 = time.time()
        out = thunk()
        rec = {"secs": round(time.time() - t0, 2), **out, **extra}
        results[name] = rec
        print(f"{name}: {rec}", flush=True)
        return rec

    # --- the O(d) star path: cluster recovery must be exact
    def star_components():
        edges = dedup.lsh_candidate_edges(docs)
        n_edges = edges.count()
        labels = dedup.connected_components_twostar(edges)
        fam = (
            labels.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("m"))
            .orderBy(F.col("m").desc())
            .first()
        )
        return {"edges": n_edges, "giant_cluster": fam["m"],
                "giant_label": fam["cluster_id"]}

    rec = run("star_edges_twostar", star_components)
    assert rec["giant_cluster"] == CLUSTER_SIZE, rec
    assert rec["giant_label"] == CLUSTER_START, rec

    def keepers():
        k = dedup.dup_cluster_keepers(docs)
        giant = k.orderBy(F.col("n_members").desc()).first()
        return {
            "clusters": k.count(),
            "giant_members": giant["n_members"],
            "giant_keeper": giant["keeper_id"],
        }

    rec = run("dup_cluster_keepers", keepers)
    assert rec["giant_members"] == CLUSTER_SIZE, rec
    assert rec["giant_keeper"] == CLUSTER_START, rec  # quality ties → min id

    # --- the capped pair emitters: levers must engage
    def capped_minhash():
        p = dedup.minhash_lsh_pairs(docs, max_band_df=20)
        total = p.count()
        in_cluster = p.filter(
            (F.col("doc_a") >= CLUSTER_START) & (F.col("doc_b") >= CLUSTER_START)
        ).count()
        return {"pairs": total, "cluster_pairs": in_cluster}

    rec = run("minhash_pairs_capped20", capped_minhash)
    assert rec["cluster_pairs"] == 0, rec  # giant bands dropped pre-expansion

    def capped_simhash():
        p = dedup.simhash_hamming_pairs(
            docs, max_band_df=dedup.HAMMING_BAND_DF
        )
        total = p.count()
        in_cluster = p.filter(
            (F.col("doc_a") >= CLUSTER_START) & (F.col("doc_b") >= CLUSTER_START)
        ).count()
        return {"pairs": total, "cluster_pairs": in_cluster}

    rec = run("simhash_pairs_capped", capped_simhash)
    assert rec["cluster_pairs"] == 0, rec

    def capped_jaccard():
        p = dedup.jaccard_pairs(docs, max_shingle_df=10)
        return {"pairs": p.count()}

    run("jaccard_pairs_capped10", capped_jaccard)

    # --- dd21: hot gram + fully-repeated clone text, buffers linear
    def ngram_cov():
        cov = dedup.repeated_ngram_coverage(docs)
        clones = cov.filter(F.col("doc_id") >= CLUSTER_START)
        stats = clones.agg(
            F.count(F.lit(1)).alias("rows"),
            F.min("coverage").alias("min_cov"),
        ).first()
        return {"rows": cov.count(), "clone_rows": stats["rows"],
                "clone_min_cov": float(stats["min_cov"] or 0.0)}

    rec = run("repeated_ngram_coverage", ngram_cov)
    # every 8-gram of a clone doc recurs 10k× corpus-wide; operator
    # semantics are per-corpus, so clone coverage must be total
    assert rec["clone_min_cov"] >= 0.99, rec

    # --- the uncapped O(d²) receipt (the reason the levers exist)
    if not args.skip_uncapped:
        def uncapped():
            return {"pairs": dedup.minhash_lsh_pairs(docs).count()}

        rec = run("minhash_pairs_UNCAPPED", uncapped,
                  note="the O(d^2) receipt: C(10k,2)*~1 pairs")
        assert rec["pairs"] >= 49_990_000, rec

    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
