"""Training-data pipeline operators beyond single analyses: subword
token accounting, deterministic train/val/test splits, weighted
source mixing, and the end-to-end C4-style corpus cleaning chain
(BASELINE.json north star — what a 100 TB pretraining-data job
actually runs).

Determinism: splits/sampling decide membership by md5-derived hash
buckets of the stable doc_id (never RNG, never row order), so the same
corpus always yields the same split on any cluster size — and the
DuckDB oracles reproduce membership exactly. The subword tokenizer is
a lookahead-free regex shared verbatim between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from trello_github_etl_spark.io import load_table
from trello_github_etl_spark.operators import packing, textstats
from trello_github_etl_spark.operators.gen import exploded
from trello_github_etl_spark.operators.parallel import ensure_parallelism
from trello_github_etl_spark.queries.llm_q import (
    DOC_SHIFT,
    SQL_H60,
    SQL_STOPLIST,
    SQL_TOKENS,
)
from trello_github_etl_spark.registry import query

# GPT-2-style pre-tokenizer, simplified to the lookahead-free subset
# RE2 (DuckDB) and java.util.regex both support with leftmost-first
# alternation: contraction suffixes, space-glued word pieces, short
# digit runs (BPE-ish number chunking), punctuation runs.
SUBWORD_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]{1,3}| ?[^a-z0-9\s']+"
SQL_SUBWORD_RE = SUBWORD_RE.replace("'", "''")

# doc_id → 60-bit md5 bucket, salted per use so the split hash and the
# mix hash are independent.
def _hash_bucket(salt: str, doc_id: Column, mod: int) -> Column:
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), doc_id.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return h % mod


def _sql_hash_bucket(salt: str, mod: int) -> str:
    return (
        "CAST(TRY_CAST('0x' || substr(md5('" + salt + "' || "
        "CAST(doc_id AS VARCHAR)), 1, 15) AS UBIGINT) AS BIGINT) % " + str(mod)
    )


@query(
    "t6_subword_tokens",
    oracle=f"""
    WITH pieces AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '{SQL_SUBWORD_RE}') AS pc,
             length(text) AS n_chars
      FROM documents
    )
    SELECT doc_id,
           len(pc) AS n_subwords,
           CASE WHEN len(pc) = 0 THEN 0.0
                ELSE CAST(n_chars AS DOUBLE) / len(pc) END AS chars_per_subword
    FROM pieces
    """,
)
def t6_subword_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token accounting: subword piece counts per document via
    a GPT-2-style pre-tokenizer regex — the budget-estimation pass a
    pretraining pipeline runs before any real tokenizer, kept
    JVM-side (one regexp scan, no UDF)."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    pc = F.regexp_extract_all(F.lower(F.col("text")), F.lit(SUBWORD_RE), 0)
    n = F.size(pc)
    return docs.select(
        "doc_id",
        n.alias("n_subwords"),
        F.when(n == 0, F.lit(0.0))
        .otherwise(F.length("text").cast("double") / n)
        .alias("chars_per_subword"),
    )


@query(
    "samp1_stratified_split",
    oracle=f"""
    WITH assigned AS (
      SELECT lang, n_chars,
             CASE WHEN {_sql_hash_bucket('split|', 100)} < 80 THEN 'train'
                  WHEN {_sql_hash_bucket('split|', 100)} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT lang, split, COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(n_chars) AS mean_chars
    FROM assigned GROUP BY lang, split
    """,
)
def samp1_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by hash bucket of
    the stable doc_id — reshuffle-proof and cluster-size-independent
    (the property RNG sampling lacks), reported per language."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    b = _hash_bucket("split|", F.col("doc_id"), 100)
    split = (
        F.when(b < 80, F.lit("train"))
        .when(b < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            (
                F.sum(F.col("n_chars").cast("decimal(18,2)")).cast("double")
                / F.count("n_chars")
            ).alias("mean_chars"),
        )
    )


@query(
    "samp2_weighted_mix",
    oracle=f"""
    WITH rated AS (
      SELECT doc_id, source,
             250 * ((CAST(substr(source, 4) AS INT) % 4) + 1) AS rate_pm
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_total,
           COUNT(CASE WHEN {_sql_hash_bucket('mix|', 1000)} < rate_pm
                      THEN 1 END) AS n_kept,
           MAX(rate_pm) AS rate_pm
    FROM rated GROUP BY source
    """,
)
def samp2_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset mixing: each source keeps a per-source share
    (25/50/75/100% here, derived from the source id) decided by an
    independent hash of doc_id — how pretraining mixes re-weight web
    vs curated corpora. Membership is a per-row predicate: no
    shuffle, no RNG, repeatable across runs and partitionings."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    rate_pm = 250 * (
        (F.substring("source", 4, 10).cast("int") % 4) + 1
    )
    keep = _hash_bucket("mix|", F.col("doc_id"), 1000) < F.col("rate_pm")
    return (
        docs.withColumn("rate_pm", rate_pm)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.count(F.when(keep, 1)).alias("n_kept"),
            F.max("rate_pm").alias("rate_pm"),
        )
    )


SAMP3_CAP = 10


@query(
    "samp3_temperature_rebalance",
    oracle=f"""
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_source
      FROM documents GROUP BY source
    ),
    rated AS (
      SELECT source, n_source,
             least(CAST(1 AS DOUBLE),
                   sqrt(CAST({SAMP3_CAP} AS DOUBLE)
                        / CAST(n_source AS DOUBLE))) AS keep_rate
      FROM counts
    )
    SELECT d.doc_id, d.source, r.n_source, r.keep_rate,
           CASE WHEN {_sql_hash_bucket('temp|', 1000000)}
                     < CAST(floor(r.keep_rate * 1000000.0) AS BIGINT)
                THEN 1 ELSE 0 END AS kept
    FROM documents d JOIN rated r USING (source)
    """,
)
def samp3_temperature_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-style source rebalancing (the XLM-R / multilingual
    pretraining move): over-represented sources are down-sampled
    toward sqrt proportions — keep_rate = min(1, sqrt(cap/n_s)) — so
    head sources shrink by the square root of their excess while tail
    sources are kept whole. The keep decision is a salted hash of the
    stable doc_id against floor(rate*1e6): repeatable across runs,
    partitionings and cluster sizes, no RNG.

    Cross-engine FP determinism: the rate chain is division → sqrt →
    multiply → floor, all IEEE correctly-rounded operations on exact
    integer inputs, so Spark and DuckDB agree bitwise (the reason the
    exponent is 1/2 and not a free temperature parameter: pow() makes
    no cross-platform rounding promise; sqrt does). Scale shape: one
    tiny per-source count agg broadcast back onto the scan — the
    verdict is a narrow map over the corpus, no row shuffle.
    """
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    counts = docs.groupBy("source").agg(F.count("*").alias("n_source"))
    rate = F.least(
        F.lit(1.0),
        F.sqrt(F.lit(float(SAMP3_CAP)) / F.col("n_source").cast("double")),
    )
    rated = counts.select(
        "source",
        "n_source",
        rate.alias("keep_rate"),
        F.floor(rate * F.lit(1000000.0)).cast("bigint").alias("_thr"),
    )
    return (
        docs.join(F.broadcast(rated), "source")
        .select(
            "doc_id",
            "source",
            "n_source",
            "keep_rate",
            (
                _hash_bucket("temp|", F.col("doc_id"), 1000000)
                < F.col("_thr")
            )
            .cast("int")
            .alias("kept"),
        )
    )


SAMP4_K = 20  # sample size per source
SAMP4_MARGIN = 4  # survivor head-room multiple over k
SAMP4_MOD = 1_000_000


@query(
    "samp4_per_source_sample",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_source FROM documents GROUP BY source
    ),
    thr AS (
      SELECT source, n_source,
             least({SAMP4_MOD},
                   ({SAMP4_MARGIN * SAMP4_K} * {SAMP4_MOD} + n_source - 1)
                     // n_source) AS _thr
      FROM counts
    ),
    survivors AS (
      SELECT d.source, d.doc_id,
             {_sql_hash_bucket('samp4|', SAMP4_MOD)} AS h
      FROM documents d JOIN thr ON thr.source = d.source
      WHERE {_sql_hash_bucket('samp4|', SAMP4_MOD)} < thr._thr
    ),
    ranked AS (
      SELECT source, doc_id, h,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY h ASC, doc_id ASC) AS samp_rank
      FROM survivors
    )
    SELECT source, doc_id, h, samp_rank
    FROM ranked WHERE samp_rank <= {SAMP4_K}
    """,
)
def samp4_per_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-source sample (the 'show me 20 docs from
    every source of a 100 TB corpus' op) — top-k by salted hash of
    the stable doc_id, so the sample is repeatable across runs,
    partitionings and cluster sizes, and statistically uniform.

    Scale shape — the window never sees the corpus: per-source counts
    (tiny agg) broadcast back as hash thresholds ceil(margin·k·MOD /
    n_source), the scan keeps ~margin·k survivors per source (exact
    integer arithmetic, replayed by the oracle), and only that
    KB-sized survivor set is shuffled and rank-windowed.  A plain
    ROW_NUMBER-over-source would sort every row of the biggest
    source in one task — the single-partition-sort trap (SCALE.md
    lesson 19) this two-phase shape exists to dodge.

    The margin is the under-sample guard: a source yields fewer than
    k survivors only if its k-th-smallest hash exceeds margin·k
    expectations — P < e^(-k(margin-ln margin-1)) by Chernoff, ~1e-15
    at k=20, margin=4.  The oracle replays the same prefilter, so the
    correctness gate compares like-for-like at any data size."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    counts = docs.groupBy("source").agg(F.count("*").alias("n_source"))
    # DIV keeps the ceil-division in exact BIGINT like the oracle's
    # `//` — bigint `/` in Spark is a double division whose truncating
    # cast could cross an integer boundary if the constants ever grow
    # past 2^53 (r4 code review).
    numer = SAMP4_MARGIN * SAMP4_K * SAMP4_MOD
    thr = counts.select(
        "source",
        F.least(
            F.lit(SAMP4_MOD).cast("bigint"),
            F.expr(f"({numer} + n_source - 1) DIV n_source"),
        ).alias("_thr"),
    )
    h = _hash_bucket("samp4|", F.col("doc_id"), SAMP4_MOD)
    survivors = (
        docs.join(F.broadcast(thr), "source")
        .withColumn("h", h)
        .filter(F.col("h") < F.col("_thr"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    return (
        survivors.withColumn("samp_rank", F.row_number().over(w))
        .filter(F.col("samp_rank") <= SAMP4_K)
        .select("source", "doc_id", "h", "samp_rank")
    )


SAMP5_BUDGET = 2000  # per-source char budget
SAMP5_MARGIN = 4


@query(
    "samp5_source_char_budget",
    oracle=f"""
    WITH tots AS (
      SELECT source, SUM(CAST(n_chars AS BIGINT)) AS t_chars
      FROM documents GROUP BY source
    ),
    thr AS (
      SELECT source,
             least({SAMP4_MOD},
                   ({SAMP5_MARGIN * SAMP5_BUDGET * SAMP4_MOD} + t_chars - 1)
                     // t_chars) AS _thr
      FROM tots
    ),
    survivors AS (
      SELECT d.source, d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars,
             {_sql_hash_bucket('samp5|', SAMP4_MOD)} AS h
      FROM documents d JOIN thr ON thr.source = d.source
      WHERE {_sql_hash_bucket('samp5|', SAMP4_MOD)} < thr._thr
    ),
    cum AS (
      SELECT source, doc_id, h, n_chars,
             COALESCE(SUM(n_chars) OVER (
               PARTITION BY source ORDER BY h ASC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM survivors
    )
    SELECT source, doc_id, h, n_chars,
           CAST(cum_before + n_chars AS BIGINT) AS cum_chars
    FROM cum WHERE cum_before < {SAMP5_BUDGET}
    """,
)
def samp5_source_char_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every source at a fixed DATA budget (chars here; the same
    shape serves token budgets) — the 'mix sources to a recipe' op
    of a pretraining pipeline, where the unit that matters is tokens
    contributed, not document count (samp2/samp3's unit).  Docs are
    admitted in salted-hash order until the budget is crossed; the
    doc that crosses it is kept (standard boundary convention), so
    every source contributes ≥ its budget once it has the mass.

    Scale shape — samp4's pre-window pruning extended to prefix
    sums: a salted hash is UNIFORM and independent of doc length, so
    the token mass under hash < t is ~ (t/MOD)·T_s; broadcasting
    thresholds ceil(margin·B·MOD / T_s) back onto the scan keeps
    ~margin·B worth of chars per source, and only that sliver pays
    the ordered cumulative-sum window.  The budget boundary falls
    outside the survivor set only if the survivors carry < B chars —
    P < e^(-Θ(margin)) per source, same Chernoff family as samp4.
    All threshold arithmetic is exact BIGINT, the cumsum is an exact
    BIGINT window, and the oracle replays both."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tots = docs.groupBy("source").agg(
        F.sum(F.col("n_chars").cast("bigint")).alias("t_chars")
    )
    numer = SAMP5_MARGIN * SAMP5_BUDGET * SAMP4_MOD
    thr = tots.select(
        "source",
        F.least(
            F.lit(SAMP4_MOD).cast("bigint"),
            F.expr(f"({numer} + t_chars - 1) DIV t_chars"),
        ).alias("_thr"),
    )
    h = _hash_bucket("samp5|", F.col("doc_id"), SAMP4_MOD)
    survivors = (
        docs.select(
            "source", "doc_id", F.col("n_chars").cast("bigint").alias("n_chars")
        )
        .join(F.broadcast(thr), "source")
        .withColumn("h", h)
        .filter(F.col("h") < F.col("_thr"))
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("h").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        survivors.withColumn(
            "cum_before", F.coalesce(F.sum("n_chars").over(w), F.lit(0))
        )
        .filter(F.col("cum_before") < SAMP5_BUDGET)
        .select(
            "source",
            "doc_id",
            "h",
            "n_chars",
            (F.col("cum_before") + F.col("n_chars")).alias("cum_chars"),
        )
    )


@query(
    "pipe1_clean_corpus",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, text,
             {SQL_TOKENS.format(t='text')} AS tk,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    scored AS (
      SELECT doc_id, fp,
        len(tk) AS n_tokens,
        CASE WHEN len(tk) = 0 THEN 0.0
             ELSE CAST(len(list_filter(tk, x -> list_contains({SQL_STOPLIST}, x))) AS DOUBLE) / len(tk)
        END AS stop_ratio,
        CASE WHEN len(tk) = 0 THEN 0.0
             ELSE CAST(list_reduce(list_transform(tk, x -> length(x)), (a,b) -> a+b) AS DOUBLE) / len(tk)
        END / 10.0 AS len_term,
        CASE WHEN length(text) = 0 THEN 0.0
             ELSE CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) / length(text)
        END AS punct_ratio
      FROM toks
    ),
    quality AS (
      SELECT doc_id, fp, n_tokens, stop_ratio,
        0.4 * stop_ratio
        + 0.4 * (CASE WHEN len_term > 1.0 THEN 1.0 ELSE len_term END)
        + 0.2 * (1.0 - punct_ratio) AS quality,
        MIN(doc_id) OVER (PARTITION BY fp) AS keeper_id
      FROM scored
    )
    SELECT doc_id, n_tokens, quality
    FROM quality
    WHERE stop_ratio > {textstats.EN_STOPWORD_RATIO_THRESHOLD}
      AND quality >= 0.4
      AND n_tokens BETWEEN 10 AND 500
      AND doc_id = keeper_id
    """,
)
def pipe1_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4-style cleaning chain as ONE declarative plan: language
    gate (heuristic en), quality threshold, token-length band, and
    exact-dup removal (keep the min-id doc per fingerprint). Catalyst
    fuses the scalar gates into the scan stage; only the dedup window
    shuffles (on the uniformly-distributed fingerprint), so at 100 TB
    the chain is one narrow pass + one skew-free exchange."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    # shared token projection (4 tokenizations -> 1, SCALE.md lesson 38)
    tk = F.col("_tk")
    scored = docs.select(
        "doc_id", textstats.tokens(t).alias("_tk"), "text"
    ).select(
        "doc_id",
        textstats.fingerprint(t).alias("fp"),
        textstats.token_count_of(tk).alias("n_tokens"),
        textstats.stopword_ratio_of(tk).alias("stop_ratio"),
        textstats.quality_score_of(tk, t).alias("quality"),
    )
    keeper = F.min("doc_id").over(Window.partitionBy("fp"))
    return (
        scored.withColumn("keeper_id", keeper)
        .filter(
            (F.col("stop_ratio") > textstats.EN_STOPWORD_RATIO_THRESHOLD)
            & (F.col("quality") >= 0.4)
            & F.col("n_tokens").between(10, 500)
            & (F.col("doc_id") == F.col("keeper_id"))
        )
        .select("doc_id", "n_tokens", "quality")
    )


@query(
    "pipe2_source_cap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, text, {SQL_TOKENS.format(t='text')} AS tk
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source,
        CASE WHEN len(tk) = 0 THEN 0.0
             ELSE CAST(len(list_filter(tk, x -> list_contains({SQL_STOPLIST}, x))) AS DOUBLE) / len(tk)
        END AS stop_ratio,
        CASE WHEN len(tk) = 0 THEN 0.0
             ELSE CAST(list_reduce(list_transform(tk, x -> length(x)), (a,b) -> a+b) AS DOUBLE) / len(tk)
        END / 10.0 AS len_term,
        CASE WHEN length(text) = 0 THEN 0.0
             ELSE CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) / length(text)
        END AS punct_ratio
      FROM toks
    ),
    quality AS (
      SELECT doc_id, source,
        0.4 * stop_ratio
        + 0.4 * (CASE WHEN len_term > 1.0 THEN 1.0 ELSE len_term END)
        + 0.2 * (1.0 - punct_ratio) AS quality
      FROM scored
    ),
    ranked AS (
      SELECT doc_id, source, quality,
        ROW_NUMBER() OVER (
          PARTITION BY source ORDER BY quality DESC, doc_id ASC) AS rk
      FROM quality
    )
    SELECT doc_id, source, quality, rk FROM ranked WHERE rk <= 20
    """,
)
def pipe2_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap: keep at most N docs per source, best quality
    first — the web-crawl balance step that stops one domain from
    dominating the mix. One window shuffle keyed by source; at 100 TB
    with few giant domains that key skews, so the scale path is the
    two-phase top-N (per-partition partial rank, then final rank over
    ≤ N·parts survivors — same shape as skew_q's salted rollup); at
    testdata cardinality the single window IS the right plan."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    # shared token projection (SCALE.md lesson 38)
    scored = docs.select(
        "doc_id", "source", textstats.tokens(t).alias("_tk"), "text"
    ).select(
        "doc_id",
        "source",
        textstats.quality_score_of(F.col("_tk"), t).alias("quality"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("doc_id", "source", "quality", "rk")
    )


CHUNK_W = 50  # tokens per training chunk
CHUNK_S = 40  # stride (10-token overlap carries context across cuts)


@query(
    "pipe3_token_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS.format(t='text')} AS tk FROM documents
    ),
    starts AS (
      SELECT doc_id, tk,
             unnest(range(1, greatest(len(tk), 1) + 1, {CHUNK_S})) AS st
      FROM toks
    ),
    chunks AS (
      SELECT doc_id, (st - 1) // {CHUNK_S} AS chunk_idx,
             list_slice(tk, st, st + {CHUNK_W - 1}) AS chunk
      FROM starts
    )
    SELECT doc_id, chunk_idx, len(chunk) AS n_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_fp
    FROM chunks
    """,
)
def pipe3_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: cut each doc's token stream into
    fixed-width, overlapping training chunks (the sequence-prep step
    between cleaning and tokenizer/packing in a pretraining pipeline,
    and the chunker of a RAG index build).

    Narrow explode: tokens and the per-chunk slice are each
    materialized in their own projection before multi-reference (the
    SCALE.md no-CSE-in-lambdas rule), so per row the tokenizer runs
    once and each chunk is sliced once. Fan-out is ceil(n/stride)
    rows per doc — bounded, no shuffle anywhere."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id", textstats.tokens(F.col("text")).alias("_tk")
    )
    with_starts = base.select(
        "doc_id",
        "_tk",
        F.sequence(
            F.lit(1),
            F.greatest(F.size("_tk"), F.lit(1)),
            F.lit(CHUNK_S),
        ).alias("_starts"),
    )
    chunked = exploded(with_starts, ["doc_id", "_tk"], F.col("_starts"), "st").select(
        "doc_id",
        ((F.col("st") - 1) / CHUNK_S).cast("long").alias("chunk_idx"),
        F.slice("_tk", F.col("st"), F.lit(CHUNK_W)).alias("_chunk"),
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.size("_chunk").alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.col("_chunk"))).alias("chunk_fp"),
    )


# ---------------------------------------------------------------------------
# Sequence packing (operators/packing.py): corpus → fixed-budget
# training sequences.
# ---------------------------------------------------------------------------
PACK_BUDGET = 256
PACK_SHARDS = 8

SQL_PACK_TOKS = f"""
    toks AS (
      SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
             len({SQL_TOKENS.format(t='text')}) AS n_tokens
      FROM documents
    )"""


@query(
    "pipe4_concat_packing",
    oracle=f"""
    WITH {SQL_PACK_TOKS},
    cum AS (
      SELECT shard, doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
      FROM toks
    )
    SELECT shard, doc_id, n_tokens,
           CAST(prev // {PACK_BUDGET} AS BIGINT) AS start_seq,
           CAST(prev % {PACK_BUDGET} AS BIGINT) AS start_off,
           CAST((prev + greatest(n_tokens, 1) - 1) // {PACK_BUDGET}
                AS BIGINT) AS end_seq
    FROM cum
    """,
)
def pipe4_concat_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concatenate-and-chunk packing plan: where each doc
    lands in the shard's fixed-{PACK_BUDGET}-token sequence stream.
    Pure prefix-sum window — one shuffle, no Python, docs may
    straddle sequences (the trainer masks across the boundary)."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.size(textstats.tokens(F.col("text"))).alias("n_tokens")
    )
    return packing.concat_chunk_packing(
        toks, budget=PACK_BUDGET, shards=PACK_SHARDS
    )


# pipe5's oracle replays the greedy fold WITHOUT an O(n)-deep
# recursion (the old doc-level recursive CTE died at sf1's depth
# ~6250 — VERDICT r4 #1). Binary-lifting formulation, depth O(log n):
#   1. cum     — per-shard prefix sums of n_tokens (one window pass).
#   2. nxt(i)  — the position starting the NEXT bin if a bin starts
#      at i = 1 + max j with cum(j) <= cum(i-1)+budget, found by
#      merging data points (cum) and per-i thresholds in ONE sorted
#      window pass (data rows sort before query rows on ties so
#      zero-token plateau docs stay in the closing bin, exactly like
#      the fold); GREATEST(.., i+1) gives oversized docs (n > budget)
#      a bin of their own, also exactly like the fold.
#   3. hop(k,i) — position after 2^k bins starting at i, by pointer
#      doubling (recursion over k, depth PACK_LIFT_K; saturated rows
#      prune out of higher levels, absent = beyond corpus).
#   4. walk    — per-position binary-lifting count of bin starts <= p
#      from position 1: cnt ends as p's 0-based bin index, cur as its
#      bin's first position; fill = cum(p) - cum(cur-1).
# Every step is equi-joins + windows — deliberately NO list_reduce:
# DuckDB 1.0 miscomputes lambda folds when their CTE is consumed by a
# recursive CTE (verified: same expression right outside recursion is
# correct, inside it drifts nondeterministically per shard), so the
# oracle avoids lambdas entirely. Validated identical to the
# doc-level recursion at sf0.001/0.01/0.1 and 17x faster at sf0.1
# (2.9 s vs 50.6 s); sf1 runs in ~22 s where the old form was
# infeasible.
PACK_LIFT_K = 21  # 2^21 bins/shard ceiling; cost is linear in K


@query(
    "pipe5_greedy_pack",
    oracle=f"""
    WITH RECURSIVE {SQL_PACK_TOKS},
    cumt AS (
      SELECT shard, doc_id, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn,
             SUM(n_tokens)  OVER (PARTITION BY shard ORDER BY doc_id) AS cum
      FROM toks
    ),
    events AS (
      SELECT shard, cum AS v, 0 AS isq, rn, CAST(NULL AS BIGINT) AS qi
      FROM cumt
      UNION ALL
      SELECT shard, cum - n_tokens + {PACK_BUDGET} AS v, 1 AS isq,
             CAST(NULL AS BIGINT), rn
      FROM cumt
    ),
    reach AS (
      SELECT shard, qi, isq, MAX(rn) OVER (
               PARTITION BY shard ORDER BY v, isq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS maxrn
      FROM events
    ),
    nxt AS (
      SELECT shard, qi AS i,
             GREATEST(COALESCE(maxrn, 0) + 1, qi + 1) AS j
      FROM reach WHERE isq = 1
    ),
    nshard AS (SELECT shard, MAX(rn) AS n FROM cumt GROUP BY shard),
    hop AS (
      SELECT nxt.shard, 0 AS k, i, j FROM nxt JOIN nshard USING (shard)
      WHERE j <= n
      UNION ALL
      SELECT a.shard, a.k + 1, a.i, b.j
      FROM hop a JOIN hop b ON b.shard = a.shard AND b.k = a.k AND b.i = a.j
      WHERE a.k < {PACK_LIFT_K}
    ),
    walk AS (
      SELECT shard, rn AS p, {PACK_LIFT_K} AS k,
             CAST(1 AS BIGINT) AS cur, CAST(0 AS BIGINT) AS cnt
      FROM cumt
      UNION ALL
      SELECT w.shard, w.p, w.k - 1,
             CASE WHEN h.j IS NOT NULL AND h.j <= w.p THEN h.j ELSE w.cur END,
             CASE WHEN h.j IS NOT NULL AND h.j <= w.p
                  THEN w.cnt + (CAST(1 AS BIGINT) << w.k) ELSE w.cnt END
      FROM walk w
      LEFT JOIN hop h ON h.shard = w.shard AND h.k = w.k AND h.i = w.cur
      WHERE w.k >= 0
    )
    SELECT c.shard, c.doc_id, c.n_tokens,
           w.cnt AS seq_idx,
           CAST(c.cum - s.cum + s.n_tokens AS BIGINT) AS fill
    FROM walk w
    JOIN cumt c ON c.shard = w.shard AND c.rn = w.p
    JOIN cumt s ON s.shard = w.shard AND s.rn = w.cur
    WHERE w.k = -1
    """,
)
def pipe5_greedy_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-split greedy packing: a doc never straddles sequences; the
    bin index depends on every prior placement, so this is the
    canonical applyInPandas stateful operator (three integers of
    state per shard, Arrow-batched, deterministic doc_id order).
    Oracle = binary-lifting replay of the same decision chain (see
    the block comment above the @query for the construction and the
    DuckDB-1.0 lambda-in-recursion defect it routes around)."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.size(textstats.tokens(F.col("text"))).alias("n_tokens")
    )
    return packing.greedy_pack(toks, budget=PACK_BUDGET, shards=PACK_SHARDS)


@query(
    "pipe6_corpus_shuffle",
    oracle="""
    WITH keyed AS (
      SELECT doc_id,
             md5('shuffle-epoch-0|' || CAST(doc_id AS VARCHAR)) AS k
      FROM documents
    )
    SELECT doc_id,
           CAST(TRY_CAST('0x' || substr(k, 1, 2) AS INTEGER) AS INTEGER)
             AS bucket,
           ROW_NUMBER() OVER (ORDER BY k, doc_id) AS shuffle_pos
    FROM keyed
    """,
)
def pipe6_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order permutation of the corpus. The
    oracle ranks with ONE global ROW_NUMBER; the engine computes the
    identical total order in parallel via first-hex-byte range
    buckets + broadcast prefix-sum offsets (operators/packing.py
    docstring has the scale argument — no single-partition sort)."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return packing.deterministic_shuffle(docs)


@query(
    "pipe7_clean_shuffle_pack",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, text,
             {SQL_TOKENS.format(t='text')} AS tk,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    scored AS (
      SELECT doc_id, fp,
        len(tk) AS n_tokens,
        CASE WHEN len(tk) = 0 THEN 0.0
             ELSE CAST(len(list_filter(tk, x -> list_contains({SQL_STOPLIST}, x))) AS DOUBLE) / len(tk)
        END AS stop_ratio,
        CASE WHEN len(tk) = 0 THEN 0.0
             ELSE CAST(list_reduce(list_transform(tk, x -> length(x)), (a,b) -> a+b) AS DOUBLE) / len(tk)
        END / 10.0 AS len_term,
        CASE WHEN length(text) = 0 THEN 0.0
             ELSE CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) / length(text)
        END AS punct_ratio
      FROM toks
    ),
    quality AS (
      SELECT doc_id, fp, n_tokens, stop_ratio,
        0.4 * stop_ratio
        + 0.4 * (CASE WHEN len_term > 1.0 THEN 1.0 ELSE len_term END)
        + 0.2 * (1.0 - punct_ratio) AS quality,
        MIN(doc_id) OVER (PARTITION BY fp) AS keeper_id
      FROM scored
    ),
    kept AS (
      SELECT doc_id, n_tokens
      FROM quality
      WHERE stop_ratio > {textstats.EN_STOPWORD_RATIO_THRESHOLD}
        AND quality >= 0.4
        AND n_tokens BETWEEN 10 AND 500
        AND doc_id = keeper_id
    ),
    keyed AS (
      SELECT doc_id, n_tokens,
             md5('shuffle-epoch-0|' || CAST(doc_id AS VARCHAR)) AS k,
             CAST(TRY_CAST('0x' || substr(
               md5('shuffle-epoch-0|' || CAST(doc_id AS VARCHAR)), 1, 2)
               AS INTEGER) AS INTEGER) % {PACK_SHARDS} AS shard
      FROM kept
    ),
    cum AS (
      SELECT shard, doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
      FROM keyed
    )
    SELECT shard, doc_id, n_tokens,
           CAST(prev // {PACK_BUDGET} AS BIGINT) AS start_seq,
           CAST(prev % {PACK_BUDGET} AS BIGINT) AS start_off,
           CAST((prev + greatest(n_tokens, 1) - 1) // {PACK_BUDGET}
                AS BIGINT) AS end_seq
    FROM cum
    """,
)
def pipe7_clean_shuffle_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data pipeline end-to-end in ONE declarative plan:
    C4-style gates + exact-dedup keeper (pipe1) → deterministic
    shuffle-key ordering (pipe6's permutation) → concat-chunk packing
    into {PACK_BUDGET}-token sequences (pipe4) — proof the operator
    family composes without materialization barriers. Catalyst fuses
    the scalar gates into the scan; the plan shuffles exactly twice
    (the dedup fingerprint window, then the shard/pack window), both
    on uniform md5-derived keys. This is the plan a 100 TB run would
    submit per epoch, with only `salt` changing."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    # shared token projection (4 tokenizations -> 1, SCALE.md lesson 38)
    tk = F.col("_tk")
    scored = docs.select(
        "doc_id", textstats.tokens(t).alias("_tk"), "text"
    ).select(
        "doc_id",
        textstats.fingerprint(t).alias("fp"),
        textstats.token_count_of(tk).alias("n_tokens"),
        textstats.stopword_ratio_of(tk).alias("stop_ratio"),
        textstats.quality_score_of(tk, t).alias("quality"),
    )
    keeper = F.min("doc_id").over(Window.partitionBy("fp"))
    kept = (
        scored.withColumn("keeper_id", keeper)
        .filter(
            (F.col("stop_ratio") > textstats.EN_STOPWORD_RATIO_THRESHOLD)
            & (F.col("quality") >= 0.4)
            & F.col("n_tokens").between(10, 500)
            & (F.col("doc_id") == F.col("keeper_id"))
        )
        .select("doc_id", "n_tokens")
    )
    key = F.md5(F.concat(F.lit("shuffle-epoch-0|"), F.col("doc_id").cast("string")))
    keyed = kept.withColumn("_k", key).withColumn(
        "_shard",
        F.conv(F.substring(F.col("_k"), 1, 2), 16, 10).cast("int")
        % PACK_SHARDS,
    )
    return packing.concat_chunk_packing(
        keyed,
        budget=PACK_BUDGET,
        shards=PACK_SHARDS,
        order_col="_k",
        shard_col="_shard",
    )


# ---------------------------------------------------------------------------
# pipe8 — the full Gopher/C4 keep/drop rule stack in one plan (VERDICT r2 #6)
# ---------------------------------------------------------------------------
PIPE8_QUALITY_MIN = 0.39
PIPE8_DUP2_MAX = 0.09
PIPE8_TOPW_MAX = 0.18


def _pipe8_oracle() -> str:
    from trello_github_etl_spark.queries.llm_q import (
        PII_TAIL,
        RE_EMAIL,
        RE_PHONE,
    )

    return f"""
    WITH aug AS (
      SELECT doc_id,
        CASE WHEN doc_id % 11 = 0 THEN text || '{PII_TAIL}' ELSE text END AS text
      FROM documents
    ),
    fan AS (
      SELECT doc_id, text FROM aug
      UNION ALL
      SELECT doc_id + {DOC_SHIFT}, text FROM aug WHERE doc_id % 50 = 0
    ),
    toks AS (
      SELECT doc_id, text, {SQL_TOKENS.format(t='text')} AS tk FROM fan
    ),
    parts AS (
      SELECT doc_id, text, tk,
        CASE WHEN len(tk) = 0 THEN 0.0
             ELSE CAST(len(list_filter(tk, x -> list_contains({SQL_STOPLIST}, x))) AS DOUBLE) / len(tk)
        END AS stop_ratio,
        CASE WHEN len(tk) = 0 THEN 0.0
             ELSE CAST(list_reduce(list_transform(tk, x -> length(x)), (a,b) -> a+b) AS DOUBLE) / len(tk)
        END / 10.0 AS len_term,
        CASE WHEN length(text) = 0 THEN 0.0
             ELSE CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) / length(text)
        END AS punct_ratio,
        list_transform(range(1, greatest(len(tk)-1, 0)+1),
                       i -> array_to_string(list_slice(tk, i, i+1), ' ')) AS g2,
        list_transform(
          list_transform(range(1, greatest(len(tk)-4, 0)+1),
                         i -> array_to_string(list_slice(tk, i, i+4), ' ')),
          s -> {SQL_H60.format(x='s')}) AS h
      FROM toks
    ),
    feats AS (
      SELECT doc_id,
        0.4 * stop_ratio
          + 0.4 * (CASE WHEN len_term > 1.0 THEN 1.0 ELSE len_term END)
          + 0.2 * (1.0 - punct_ratio) AS quality,
        CASE WHEN len(g2) = 0 THEN 0.0
             ELSE 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)
        END AS dup_2gram_ratio,
        CASE WHEN len(tk) = 0 THEN 0.0
             ELSE CAST(list_max(list_transform(list_distinct(tk),
                  w -> len(list_filter(tk, x -> x = w)))) AS DOUBLE) / len(tk)
        END AS top_word_ratio,
        len(regexp_extract_all(text, '{RE_EMAIL}'))
          + len(regexp_extract_all(text, '{RE_PHONE}')) AS n_pii,
        list_distinct(list_transform(
          range(1, greatest(len(h) - 7, 0) + 1),
          i -> list_min(list_slice(h, i, i + 7)))) AS wf
      FROM parts
    ),
    fps AS (SELECT doc_id, unnest(wf) AS wfp FROM feats),
    fpmin AS (
      SELECT doc_id, MIN(doc_id) OVER (PARTITION BY wfp) AS fp_min FROM fps
    ),
    dupd AS (
      SELECT doc_id, MIN(fp_min) AS dup_min FROM fpmin GROUP BY doc_id
    )
    SELECT f.doc_id, f.quality, f.dup_2gram_ratio, f.top_word_ratio,
           CAST(f.n_pii AS BIGINT) AS n_pii,
           COALESCE(d.dup_min, f.doc_id) < f.doc_id AS is_near_dup,
           f.quality >= {PIPE8_QUALITY_MIN}
             AND f.dup_2gram_ratio <= {PIPE8_DUP2_MAX}
             AND f.top_word_ratio <= {PIPE8_TOPW_MAX}
             AND f.n_pii = 0
             AND NOT (COALESCE(d.dup_min, f.doc_id) < f.doc_id) AS keep,
           concat_ws(',',
             CASE WHEN f.quality < {PIPE8_QUALITY_MIN} THEN 'low_quality' END,
             CASE WHEN f.dup_2gram_ratio > {PIPE8_DUP2_MAX} THEN 'repetitive_2gram' END,
             CASE WHEN f.top_word_ratio > {PIPE8_TOPW_MAX} THEN 'top_word_concentration' END,
             CASE WHEN f.n_pii > 0 THEN 'pii' END,
             CASE WHEN COALESCE(d.dup_min, f.doc_id) < f.doc_id THEN 'near_dup' END
           ) AS drop_reasons
    FROM feats f LEFT JOIN dupd d ON d.doc_id = f.doc_id
    """


@query("pipe8_quality_filter", oracle=_pipe8_oracle())
def pipe8_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data keep/drop rule stack — t3 quality score,
    t8 repetition signals, t7 PII counts, dd12 winnowing near-dup
    verdict — composed as ONE declarative plan over ONE scan of
    ``documents`` (plan-pinned).

    Fixture mirrors t7 + s3: every %11 doc gains a PII tail, every
    %50 doc is re-crawled verbatim at id+DOC_SHIFT — planted via an
    IN-PLAN conditional explode (per-row array fan-out), not a
    self-union, which is what keeps the scan count at one.

    Scale shape: every scalar signal (quality, repetition, PII) fuses
    into the scan stage; winnowing fingerprints explode into the one
    shuffle (window over the md5-uniform fingerprint key, NULL-fp
    rows routed to per-doc sentinels exactly like incremental_dedup),
    then one group-back to doc granularity. At 100 TB: one corpus
    read, two fp-keyed exchanges, zero UDFs, no text through the
    shuffle — only 60-bit fingerprints and the per-doc doubles.

    A doc is dropped for: low quality (< {Q}), duplicate-2gram ratio
    (> {D2}), top-word concentration (> {TW}), any PII hit, or
    sharing a winnow fingerprint with a lower-id doc (greedy
    keep-first dedup). ``drop_reasons`` lists every failed rule.
    """.format(Q=PIPE8_QUALITY_MIN, D2=PIPE8_DUP2_MAX, TW=PIPE8_TOPW_MAX)
    from trello_github_etl_spark.operators.dedup import (
        WINNOW_SHINGLE,
        _token_hash60,
        winnow_window_mins,
    )
    from trello_github_etl_spark.queries.llm_q import (
        PII_TAIL,
        RE_EMAIL,
        RE_PHONE,
    )

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    text2 = F.when(
        F.col("doc_id") % 11 == 0, F.concat("text", F.lit(PII_TAIL))
    ).otherwise(F.col("text"))
    one = F.struct(F.col("doc_id").alias("doc_id"), text2.alias("text"))
    copy = F.struct(
        (F.col("doc_id") + DOC_SHIFT).alias("doc_id"), text2.alias("text")
    )
    fan = exploded(
        docs,
        [],
        F.when(F.col("doc_id") % 50 == 0, F.array(one, copy)).otherwise(
            F.array(one)
        ),
        "r",
    ).select("r.doc_id", "r.text")

    # materialize multi-referenced arrays in their own projections
    # (lambda bodies get no CSE — SCALE.md)
    s0 = fan.select("doc_id", "text", textstats.tokens(F.col("text")).alias("_tk"))
    s1 = s0.select(
        "doc_id",
        "text",
        "_tk",
        textstats.ngrams(F.col("_tk"), 2).alias("_g2"),
        F.transform(
            textstats.ngrams(F.col("_tk"), WINNOW_SHINGLE), _token_hash60
        ).alias("_h"),
    )
    s2 = s1.select(
        "doc_id",
        textstats.quality_score_of(F.col("_tk"), F.col("text")).alias(
            "quality"
        ),
        textstats.duplicate_fraction(F.col("_g2")).alias("dup_2gram_ratio"),
        textstats.top_element_ratio(F.col("_tk")).alias("top_word_ratio"),
        (
            F.regexp_count(F.col("text"), F.lit(RE_EMAIL))
            + F.regexp_count(F.col("text"), F.lit(RE_PHONE))
        ).cast("long").alias("n_pii"),
        winnow_window_mins(F.col("_h")).alias("_w"),
    )
    # explode_outer: fingerprint-less (short) docs must keep a row;
    # the sentinel key routes them around the window partition so a
    # shard of short docs can't funnel into one task
    s3 = s2.select(
        "doc_id",
        "quality",
        "dup_2gram_ratio",
        "top_word_ratio",
        "n_pii",
        F.explode_outer("_w").alias("wfp"),
    ).withColumn(
        "_wkey",
        F.coalesce(
            F.col("wfp").cast("string"),
            F.concat(F.lit("~"), F.col("doc_id").cast("string")),
        ),
    )
    s4 = s3.withColumn(
        "_fp_min", F.min("doc_id").over(Window.partitionBy("_wkey"))
    )
    s5 = s4.groupBy(
        "doc_id", "quality", "dup_2gram_ratio", "top_word_ratio", "n_pii"
    ).agg(F.min("_fp_min").alias("_dup_min"))
    is_dup = F.col("_dup_min") < F.col("doc_id")
    return s5.select(
        "doc_id",
        "quality",
        "dup_2gram_ratio",
        "top_word_ratio",
        "n_pii",
        is_dup.alias("is_near_dup"),
        (
            (F.col("quality") >= PIPE8_QUALITY_MIN)
            & (F.col("dup_2gram_ratio") <= PIPE8_DUP2_MAX)
            & (F.col("top_word_ratio") <= PIPE8_TOPW_MAX)
            & (F.col("n_pii") == 0)
            & ~is_dup
        ).alias("keep"),
        F.concat_ws(
            ",",
            F.when(F.col("quality") < PIPE8_QUALITY_MIN, F.lit("low_quality")),
            F.when(
                F.col("dup_2gram_ratio") > PIPE8_DUP2_MAX,
                F.lit("repetitive_2gram"),
            ),
            F.when(
                F.col("top_word_ratio") > PIPE8_TOPW_MAX,
                F.lit("top_word_concentration"),
            ),
            F.when(F.col("n_pii") > 0, F.lit("pii")),
            F.when(is_dup, F.lit("near_dup")),
        ).alias("drop_reasons"),
    )


@query(
    "pipe9_curriculum_order",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS.format(t='text')} AS tk, text FROM documents
    ),
    parts AS (
      SELECT doc_id,
        CASE WHEN len(tk) = 0 THEN 0.0
             ELSE CAST(len(list_filter(tk, x -> list_contains({SQL_STOPLIST}, x))) AS DOUBLE) / len(tk)
        END AS stop_ratio,
        CASE WHEN len(tk) = 0 THEN 0.0
             ELSE CAST(list_reduce(list_transform(tk, x -> length(x)), (a,b) -> a+b) AS DOUBLE) / len(tk)
        END / 10.0 AS len_term,
        CASE WHEN length(text) = 0 THEN 0.0
             ELSE CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) / length(text)
        END AS punct_ratio
      FROM toks
    ),
    q AS (
      SELECT doc_id,
        0.4 * stop_ratio
        + 0.4 * (CASE WHEN len_term > 1.0 THEN 1.0 ELSE len_term END)
        + 0.2 * (1.0 - punct_ratio) AS quality
      FROM parts
    ),
    staged AS (
      SELECT doc_id,
             least(9, greatest(0, CAST(floor(quality * 10) AS INTEGER)))
               AS stage,
             md5('curriculum-0|' || CAST(doc_id AS VARCHAR)) AS k
      FROM q
    )
    SELECT doc_id, stage,
           ROW_NUMBER() OVER (ORDER BY stage DESC, k, doc_id)
             AS curriculum_pos
    FROM staged
    """,
)
def pipe9_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering: quality deciles (t3's score, an
    identical-expression derivation on both engines, so the floor
    bucketing agrees exactly) descending, deterministically shuffled
    within each decile — easy/high-quality data first, the curriculum
    schedule knob of a pretraining run.  The oracle ranks with one
    global window; the engine computes the identical total order via
    (stage x hex-byte) composite buckets + broadcast prefix sums
    (packing.curriculum_order) — no single-partition sort."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    # shared token projection (SCALE.md lesson 38)
    stage = F.least(
        F.lit(9),
        F.greatest(
            F.lit(0),
            F.floor(
                textstats.quality_score_of(F.col("_tk"), F.col("text")) * 10
            ).cast("int"),
        ),
    )
    staged = docs.select(
        "doc_id", textstats.tokens(F.col("text")).alias("_tk"), "text"
    ).select("doc_id", stage.alias("stage"))
    return packing.curriculum_order(staged)


SAMP6_BUDGET = 600_000  # total training budget, in chars
SAMP6_MAX_EPOCHS = 4.0  # Muennighoff et al. repeat-value knee


@query(
    "samp6_epoch_mix",
    oracle=f"""
    WITH tots AS (
      SELECT source, CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS t_chars
      FROM documents GROUP BY source HAVING SUM(n_chars) > 0
    ),
    wts AS (
      SELECT source, t_chars,
             CAST(floor(sqrt(CAST(t_chars AS DOUBLE)) * 1e9) AS BIGINT) AS q
      FROM tots
    ),
    denom AS (SELECT SUM(q) AS d FROM wts)
    SELECT source, t_chars,
           CAST(q AS DOUBLE) / CAST(d AS DOUBLE) AS share,
           least({SAMP6_MAX_EPOCHS},
                 (CAST({SAMP6_BUDGET} AS DOUBLE)
                    * (CAST(q AS DOUBLE) / CAST(d AS DOUBLE)))
                   / CAST(t_chars AS DOUBLE)) AS epochs,
           least({SAMP6_MAX_EPOCHS},
                 (CAST({SAMP6_BUDGET} AS DOUBLE)
                    * (CAST(q AS DOUBLE) / CAST(d AS DOUBLE)))
                   / CAST(t_chars AS DOUBLE))
             * CAST(t_chars AS DOUBLE) AS effective_chars,
           (CAST({SAMP6_BUDGET} AS DOUBLE)
              * (CAST(q AS DOUBLE) / CAST(d AS DOUBLE)))
             / CAST(t_chars AS DOUBLE) >= {SAMP6_MAX_EPOCHS} AS saturated
    FROM wts, denom
    """,
)
def samp6_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained mixing (Muennighoff et al. 2023, "Scaling
    Data-Constrained Language Models"): split a total training budget
    across sources by temperature-0.5 weights (sqrt of source mass —
    the standard upsample-the-tail exponent), but cap every source at
    4 epochs of its unique data — the measured knee past which
    repeated tokens stop contributing. Emits per source the share,
    the resulting repeat-epoch count, the effective (budget-weighted)
    chars, and whether the cap bound it; Σ effective_chars of
    unsaturated sources is what a scheduler would re-spread.

    Determinism: the only cross-row reduction is Σ of PER-SOURCE
    weights — quantized to exact BIGINT (floor(sqrt·1e9), the
    t10/t14 pattern) so the sum is order-free; everything after is a
    fixed-order per-row double expression both engines evaluate
    identically. Scale shape: one groupBy(source) over the table's
    own n_chars column (map-side combined, no text read at all —
    column pruning keeps the scan to two columns), then a broadcast
    crossJoin of the 1-row denominator (dq1's pattern)."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tots = (
        docs.groupBy("source")
        .agg(F.sum(F.col("n_chars").cast("bigint")).alias("t_chars"))
        .filter(F.col("t_chars") > 0)
    )
    wts = tots.withColumn(
        "q",
        F.floor(F.sqrt(F.col("t_chars").cast("double")) * F.lit(1e9)).cast(
            "bigint"
        ),
    )
    denom = wts.agg(F.sum("q").alias("d"))
    share = F.col("q").cast("double") / F.col("d").cast("double")
    raw_epochs = (F.lit(float(SAMP6_BUDGET)) * share) / F.col(
        "t_chars"
    ).cast("double")
    epochs = F.least(F.lit(SAMP6_MAX_EPOCHS), raw_epochs)
    return wts.crossJoin(F.broadcast(denom)).select(
        "source",
        "t_chars",
        share.alias("share"),
        epochs.alias("epochs"),
        (epochs * F.col("t_chars").cast("double")).alias("effective_chars"),
        (raw_epochs >= F.lit(SAMP6_MAX_EPOCHS)).alias("saturated"),
    )


SAMP7_TARGET_SOURCES = ("src0", "src1", "src2")
SAMP7_BUCKETS = 256
_SAMP7_SQL_TGT = "('" + "', '".join(SAMP7_TARGET_SOURCES) + "')"


@query(
    "samp7_dsir_importance",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {SQL_TOKENS.format(t='text')} AS t
      FROM documents
    ),
    bg AS (
      SELECT doc_id, source,
             unnest(list_transform(
               range(1, greatest(len(t) - 1, 0) + 1),
               i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toks
    ),
    wb AS (
      SELECT doc_id, source,
             CAST({SQL_H60.format(x='bigram')} % {SAMP7_BUCKETS}
                  AS INTEGER) AS bucket
      FROM bg
    ),
    per_db AS (
      SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS n_b,
             MAX(CASE WHEN source IN {_SAMP7_SQL_TGT} THEN 1 ELSE 0 END) AS tgt
      FROM wb GROUP BY doc_id, bucket
    ),
    bc AS (
      SELECT bucket, CAST(SUM(n_b) AS BIGINT) AS r_b,
             CAST(SUM(CASE WHEN tgt = 1 THEN n_b ELSE 0 END) AS BIGINT) AS t_b
      FROM per_db GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(SUM(r_b) AS BIGINT) AS r_tot,
             CAST(SUM(t_b) AS BIGINT) AS t_tot
      FROM bc
    ),
    ratios AS (
      SELECT bucket,
             (CAST(t_b + 1 AS DOUBLE) / CAST(t_tot + {SAMP7_BUCKETS} AS DOUBLE))
               / (CAST(r_b + 1 AS DOUBLE)
                    / CAST(r_tot + {SAMP7_BUCKETS} AS DOUBLE)) AS ratio
      FROM bc, tot
    ),
    perdoc AS (
      SELECT p.doc_id,
             CAST(SUM(p.n_b) AS BIGINT) AS n_bigrams,
             list(CAST(p.n_b AS DOUBLE) * r.ratio ORDER BY p.bucket) AS cs
      FROM per_db p JOIN ratios r USING (bucket) GROUP BY p.doc_id
    ),
    scored AS (
      SELECT doc_id, n_bigrams,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE), cs),
                         (a, b) -> a + b) AS imp_sum
      FROM perdoc
    )
    SELECT d.doc_id, COALESCE(s.n_bigrams, 0) AS n_bigrams, s.imp_sum,
           s.imp_sum / CAST(s.n_bigrams AS DOUBLE) AS imp_mean,
           s.imp_sum / CAST(s.n_bigrams AS DOUBLE) >= 1.0 AS keep
    FROM documents d LEFT JOIN scored s USING (doc_id)
    """,
)
def samp7_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every doc
    by its importance under a hashed-bigram model of a TARGET domain
    (sources src0-2 here) relative to the raw corpus, then keep docs
    whose mean per-instance importance clears 1.0 — the
    upsample-what-looks-like-the-target step of a pretraining mix.

    Model: bigrams hash into 256 buckets; both the target and raw
    unigram-of-buckets distributions get add-one smoothing; a doc's
    importance is the mean over its bigram instances of
    p_target(bucket)/p_raw(bucket). The canonical formulation sums
    LOG ratios — ln()'s last-ulp variance across libm implementations
    breaks bit-parity (t5's lesson), so the shipped statistic is the
    rational mean-ratio (same per-bucket ordering, exact two-engine
    agreement); on a real cluster the log-sum is a one-line swap.

    FP determinism: bucket/doc counts are exact BIGINT; each bucket
    ratio is a fixed-order chain of three IEEE divisions; per-doc
    contributions fold in SORTED bucket order (sort_array ↔ list(...
    ORDER BY bucket)) from a 0.0 init, so the double sum is
    order-free by construction. Scale shape: bigram instances
    shuffle ONCE into (doc_id, bucket) counts (the target flag rides
    as a conditional max — target docs are a filter of the same
    corpus, never a second scan); bucket totals and the 256-row
    ratio table derive from that frame and broadcast back; docs
    without bigrams stay visible with NULL scores (t14's contract).

    Plan note: Catalyst prunes the two consumers of the (doc_id,
    bucket) aggregate differently, so the explode+hash subtree plans
    twice; a localCheckpoint pin was measured at sf0.1 and is a wash
    (2.5 vs 2.6 s — the bucket shuffle dominates, and the ratio-side
    recompute prunes to the bucket column only). Revisit with a
    materialized intermediate only if a profile at larger scale
    shows the double hash pass mattering.
    """
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        # coalesce: NULL source must mean tgt=0 like the oracle's
        # CASE-ELSE (isin propagates NULL; downstream conditionals
        # would mask it, but the contract should not rely on that)
        F.coalesce(
            F.col("source").isin(*SAMP7_TARGET_SOURCES).cast("int"), F.lit(0)
        ).alias("tgt"),
        # materialize tokens BEFORE ngrams: the zip construction
        # evaluates its toks expression n+1 times with no CSE, so an
        # inline tokenizer would re-run the regex scan per slice
        # (ngrams' documented contract; t14's pattern)
        textstats.tokens(F.col("text")).alias("_tk"),
    )
    base = toks.select(
        "doc_id", "tgt", textstats.ngrams(F.col("_tk"), 2).alias("_bg")
    )
    bg = exploded(base, ["doc_id", "tgt"], F.col("_bg"), "bigram")
    from trello_github_etl_spark.operators.dedup import _token_hash60

    bucket = (_token_hash60(F.col("bigram")) % SAMP7_BUCKETS).cast("int")
    per_db = (
        bg.select("doc_id", "tgt", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("n_b"), F.max("tgt").alias("tgt"))
    )
    bc = per_db.groupBy("bucket").agg(
        F.sum("n_b").alias("r_b"),
        F.sum(F.when(F.col("tgt") == 1, F.col("n_b")).otherwise(0)).alias(
            "t_b"
        ),
    )
    tot = bc.agg(
        F.sum("r_b").alias("r_tot"), F.sum("t_b").alias("t_tot")
    )
    ratios = bc.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            (
                (F.col("t_b") + 1).cast("double")
                / (F.col("t_tot") + SAMP7_BUCKETS).cast("double")
            )
            / (
                (F.col("r_b") + 1).cast("double")
                / (F.col("r_tot") + SAMP7_BUCKETS).cast("double")
            )
        ).alias("ratio"),
    )
    perdoc = (
        per_db.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n_b").alias("n_bigrams"),
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("bucket"),
                        (F.col("n_b").cast("double") * F.col("ratio")).alias(
                            "c"
                        ),
                    )
                )
            ).alias("cs"),
        )
    )
    scored = perdoc.select(
        "doc_id",
        "n_bigrams",
        F.aggregate(
            F.transform(F.col("cs"), lambda s: s["c"]),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("imp_sum"),
    )
    imp_mean = F.col("imp_sum") / F.col("n_bigrams").cast("double")
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "imp_sum",
            imp_mean.alias("imp_mean"),
            (imp_mean >= 1.0).alias("keep"),
        )
    )


PIPE10_SHARDS = 8


@query(
    "pipe10_shard_plan",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             {_sql_hash_bucket('shard|', PIPE10_SHARDS)} AS shard_id,
             {_sql_hash_bucket('order|', 1_000_000_000)} AS ord
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, n_chars, shard_id,
             ROW_NUMBER() OVER (
               PARTITION BY shard_id ORDER BY ord ASC, doc_id ASC) AS rank
      FROM assigned
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(CAST(SUM(CAST({SQL_H60.format(x="CAST(doc_id AS VARCHAR) || ':' || CAST(rank AS VARCHAR)")} AS DECIMAL(38,0)))
             AS DECIMAL(38,0)) AS VARCHAR) AS manifest_fp
    FROM ranked GROUP BY shard_id
    """,
)
def pipe10_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writer planning: assign every doc to one of 8 output shards
    (salted-hash sharding — uniform by construction, independent of
    the intra-shard order hash) and fix a deterministic write order
    within each shard (pipe6's shuffle-order idea, scoped per
    shard). The manifest fingerprint PROVES the order without ever
    collecting a shard: each doc contributes h60(doc_id ':' rank) —
    the rank bakes the position into the hash, so any reorder,
    drop or duplicate changes the sum — while the SUM itself is
    order-insensitive exact DECIMAL, so the aggregation never needs
    the shard materialized in sequence.

    Scale shape: one narrow pass computes both hashes, one
    shard-keyed window ranks (WindowExec sorts within the shard
    partition and spills if needed — never a driver collect, never
    a SinglePartition), and the same exchange serves the final
    per-shard aggregate. Re-running the plan on the same corpus
    reproduces identical fingerprints — the idempotent-writer
    precondition; a downstream writer that lays out files in rank
    order can be audited against the manifest at any time."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    assigned = docs.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        _hash_bucket("shard|", F.col("doc_id"), PIPE10_SHARDS).alias(
            "shard_id"
        ),
        _hash_bucket("order|", F.col("doc_id"), 1_000_000_000).alias("ord"),
    )
    w = Window.partitionBy("shard_id").orderBy(
        F.col("ord").asc(), F.col("doc_id").asc()
    )
    ranked = assigned.withColumn("rank", F.row_number().over(w))
    from trello_github_etl_spark.operators.dedup import _token_hash60

    # the engine's ONE 60-bit md5 hash (dedup._token_hash60) — not a
    # re-implementation; its SQL twin below is SQL_H60 (r5 review)
    contrib = _token_hash60(
        F.concat_ws(
            ":",
            F.col("doc_id").cast("string"),
            F.col("rank").cast("string"),
        )
    )
    # manifest_fp travels as a STRING (r13, the t19 class): the exact
    # DECIMAL(38,0) sum exceeds int64, and a pandas-path fetch
    # renders wide decimals as float64 ('2.63e+19') against Spark's
    # exact digits — tools/pandas_fetch_gate.py caught exactly this
    # on pipe10's first gate run. The digits are identical on both
    # engines; only the carrier type was hazardous.
    return ranked.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
        F.sum(contrib.cast("decimal(38,0)"))
        .cast("string")
        .alias("manifest_fp"),
    )
