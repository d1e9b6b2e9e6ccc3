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
    """(doc_id, n_scored, sum_surprisal, avg_surprisal, ppl_bucket)
    for every doc with >= 1 token (explode drops empty-token docs on
    both engines — documented in the t19 oracle). Bucket 1 = most
    predictable (lowest surprisal), N_BUCKETS = most surprising;
    ntile over (avg_surprisal, doc_id) so ties are deterministic.
    The ntile is ranking.with_global_ntile — the distributed exact
    two-phase rank, NOT a partitionless window (single-task sort)."""
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
    ).select(
        id_col, "n_scored", "sum_surprisal", "avg_surprisal", "ppl_bucket"
    )
