"""Unigram-LM surprisal scoring — the integer-exact core of a
CCNet-style perplexity filter (Wenzek et al. 2020: bucket documents
by language-model perplexity, keep the fluent tail).

A real deployment scores against a trained KenLM; the engine
primitive underneath is: build a token->statistic table over the
corpus (or load one), JOIN every document token against it, and
aggregate per document. That join/aggregate shape is what this
operator provides, with the corpus's own unigram counts as the LM.

Numeric contract: the per-token statistic is the INTEGER
``floor(log2(total_tokens / count(token))) + 1`` = the binary digit
count of the integer quotient — computed via length(bin(q)), pure
integer+string ops, so Spark and DuckDB agree bit-for-bit (libm
``ln`` is not correctly-rounded and differs across engines in the
last ULP; summing doubles is order-dependent on top of that). The
only float op in the pipeline is ONE bigint/bigint -> double
division per document (IEEE-exact in both engines).

Scale shape: tokens explode (narrow), one groupBy(word) shuffle
builds the vocab table, the doc-token -> vocab join broadcasts the
vocab side (vocabulary ~ millions of rows at 100 TB, far under the
corpus), and the per-doc aggregate shuffles on doc_id. The total
token count rides the vocab table as a 1-row broadcast product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10


def unigram_surprisal(
    docs: DataFrame, id_col: str = "doc_id", toks_col: str = "_tk"
) -> DataFrame:
    """(doc_id, n_scored, sum_surprisal, ppl_bucket) for every doc
    with >= 1 token (explode drops empty-token docs on both engines —
    documented in the t19 oracle). Bucket 1 = most predictable
    (lowest surprisal), N_BUCKETS = most surprising; ntile over
    (avg_surprisal, doc_id) so ties are deterministic. The ntile is
    ranking.with_global_ntile — the distributed exact two-phase
    rank, NOT a partitionless window (single-task sort).

    The DOUBLE avg_surprisal (= sum_surprisal / n_scored, one
    IEEE-exact division) is INTERNAL ONLY — the ntile sort key. It
    is deliberately NOT in the output: it is fully redundant given
    the two exact integers, and r12's first driver exposure showed
    the driver environment's value canonicalization of raw doubles
    (and of DuckDB's uncast HUGEINT sums) cannot be assumed — the
    hashed surface carries only integers (VERDICT r12 #1)."""
    from trello_github_etl_spark.operators.ranking import (
        with_global_ntile,
    )

    tok = docs.select(id_col, F.explode(toks_col).alias("w"))
    freq = tok.groupBy("w").agg(F.count("*").alias("cnt"))
    # total token count from the DOC-level frame (one cheap size()
    # aggregate) — summing freq's cnt would re-run the whole
    # explode+groupBy subtree as a second consumer, tokenizing the
    # corpus an extra time (verified in the physical plan)
    total = docs.agg(
        F.sum(F.size(toks_col)).cast("long").alias("total")
    )
    vocab = freq.crossJoin(F.broadcast(total)).select(
        "w",
        F.length(F.bin(F.expr("total div cnt"))).alias("s"),
    )
    per = (
        tok.join(F.broadcast(vocab), "w")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_scored"),
            F.sum("s").alias("sum_surprisal"),
        )
    )
    avg = F.col("sum_surprisal").cast("double") / F.col("n_scored")
    scored = per.withColumn("avg_surprisal", avg)
    return with_global_ntile(
        scored,
        N_BUCKETS,
        "avg_surprisal",
        [id_col],
        out_col="ppl_bucket",
    ).select(id_col, "n_scored", "sum_surprisal", "ppl_bucket")


def bigram_pairs(
    docs: DataFrame, id_col: str = "doc_id", toks_col: str = "tk"
) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair. Docs with
    fewer than two tokens drop (no bigrams), BEFORE the transform:
    ``sequence(1, size-1)`` on a one-token doc would be
    sequence(1, 0), which Spark evaluates DESCENDING ([1, 0]) and
    would fabricate two out-of-range pairs. Narrow explode, no
    shuffle."""
    return (
        docs.filter(F.size(toks_col) >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(1, size({toks_col}) - 1), "
                    f"i -> struct({toks_col}[i-1] AS w1, "
                    f"{toks_col}[i] AS w2))"
                )
            ).alias("_bg"),
        )
        .select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    )


def stupid_backoff_surprisal(
    docs: DataFrame,
    train: DataFrame,
    id_col: str = "doc_id",
    toks_col: str = "tk",
) -> DataFrame:
    """Stupid-backoff bigram-LM scoring (Brants et al. 2007, the
    smoothing CCNet-class corpus filters actually deploy): score a
    bigram (a, b) by count(ab)/count(a) when the training corpus saw
    it, else back off to alpha * count(b)/N, else (unseen word) to
    alpha * 1/N. ``train`` is the LM corpus (same schema as
    ``docs``); held-out scoring — the production shape — means the
    backoff branches genuinely fire on every doc the LM didn't see.

    Numeric contract (the t19 discipline): per-bigram INTEGER
    surprisal as binary digit counts of integer quotients —
    seen:      length(bin(c1(a) div c2(ab)))
    backoff:   2 + length(bin(N div c1(b)))
    unseen:    2 + length(bin(N))
    with alpha = 1/4 (exactly two bits; Brants' 0.4 is documented-
    deviated here because 0.4 is not a power of two and would drag
    libm log into the hot path — cross-engine last-ULP drift). The
    only float op is ONE bigint/bigint -> double division per doc.

    Scale shape: unigram table broadcasts (vocab << corpus). The
    bigram-count table is the LM's bulk — millions of rows at small
    SF, O(1e10) on a 100 TB train corpus — so its join is NOT
    broadcast-pinned: the planner broadcasts while it fits and AQE
    flips to a shuffled equi-join on (w1, w2) beyond the threshold,
    which is the right plan both sides of the boundary. One
    (w1, w2) map-side-combined shuffle builds it; per-doc aggregate
    shuffles on doc_id; the decile is the distributed two-phase
    ntile."""
    from trello_github_etl_spark.operators.ranking import (
        with_global_ntile,
    )

    # vocab-sized and consumed TWICE (u1 on w1, u2 on w2): persist,
    # or both consumers re-run the train-corpus explode+groupBy —
    # one extra full tokenization pass at 100 TB. Lifetime contract
    # as ranking.with_global_rank: callers sweeping many queries
    # clear between queries (bench/verify clearCache per query).
    tr_uni = (
        train.select(F.explode(toks_col).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("_c1"))
        .persist()
    )
    tr_n = train.agg(F.sum(F.size(toks_col)).cast("long").alias("_n"))
    tr_bi = (
        bigram_pairs(train, id_col, toks_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("_c2"))
    )

    pairs = bigram_pairs(docs, id_col, toks_col)
    u1 = tr_uni.select(F.col("w").alias("w1"), F.col("_c1").alias("_c1a"))
    u2 = tr_uni.select(F.col("w").alias("w2"), F.col("_c1").alias("_c1b"))
    joined = (
        pairs.join(tr_bi, ["w1", "w2"], "left")
        .join(F.broadcast(u1), "w1", "left")
        .join(F.broadcast(u2), "w2", "left")
        .crossJoin(F.broadcast(tr_n))
    )
    s = (
        F.when(
            F.col("_c2").isNotNull(),
            F.length(F.bin(F.expr("_c1a div _c2"))),
        )
        .when(
            F.col("_c1b").isNotNull(),
            F.lit(2) + F.length(F.bin(F.expr("_n div _c1b"))),
        )
        .otherwise(F.lit(2) + F.length(F.bin(F.col("_n"))))
    )
    per = (
        joined.select(
            id_col,
            s.cast("long").alias("_s"),
            F.col("_c2").isNull().cast("long").alias("_bo"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("_bo").alias("n_backoff"),
            F.sum("_s").alias("sum_surprisal"),
        )
    )
    avg = F.col("sum_surprisal").cast("double") / F.col("n_bigrams")
    scored = per.withColumn("avg_surprisal", avg)
    return with_global_ntile(
        scored,
        N_BUCKETS,
        "avg_surprisal",
        [id_col],
        out_col="ppl_bucket",
    ).select(
        id_col,
        "n_bigrams",
        "n_backoff",
        "sum_surprisal",
        "avg_surprisal",
        "ppl_bucket",
    )
