"""Text-analysis operators for training-data pipelines (BASELINE.json
north star): tokenization, language-ID heuristic, quality scoring,
document fingerprinting.

All-native column expressions (JVM codegen, no UDF). Numeric scores
use a fixed operation order so DuckDB oracles reproduce the exact
doubles. Tokenization uses a regex shared verbatim with the oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Word-ish tokens; shared with DuckDB regexp_extract_all.
TOKEN_RE = r"[A-Za-z0-9']+"

# Tiny English stopword list for the language heuristic.
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this",
)

EN_STOPWORD_RATIO_THRESHOLD = 0.05


def tokens(text: Column) -> Column:
    """Lower-cased word tokens (regexp scan, no split-empties)."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)


# ``*_of`` variants take an already-tokenized array column. Multi-stat
# consumers should project ``tokens(text)`` ONCE and feed the column
# to these: codegen subexpression elimination does NOT dedupe repeated
# ``tokens()`` trees composed side-by-side in one projection, so the
# text-taking wrappers below re-run the regex scan per stat (measured
# at sf1: t1's four stats 1.88 s -> 1.13 s with a shared token column
# — SCALE.md lesson 38). CollapseProject keeps the shared projection
# materialized because the alias is non-cheap and multiply used.
def token_count_of(toks: Column) -> Column:
    return F.size(toks)


def stopword_ratio_of(toks: Column) -> Column:
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        n_stop.cast("double") / F.size(toks)
    )


def token_count(text: Column) -> Column:
    return token_count_of(tokens(text))


def stopword_ratio(text: Column) -> Column:
    return stopword_ratio_of(tokens(text))


def detect_language(text: Column) -> Column:
    """n-gram-free heuristic: English iff stopword ratio clears the bar.

    (A production system chains more lists/charsets; the operator
    shape — pure column expression over tokens — is the point.)
    """
    return F.when(
        stopword_ratio(text) > EN_STOPWORD_RATIO_THRESHOLD, F.lit("en")
    ).otherwise(F.lit("other"))


def mean_token_length_of(toks: Column) -> Column:
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(toks)
    )


def mean_token_length(text: Column) -> Column:
    return mean_token_length_of(tokens(text))


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(text) - F.length(
        F.regexp_replace(text, r"[^\w\s]", "")
    )
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        n_punct.cast("double") / F.length(text)
    )


def quality_score_of(toks: Column, text: Column) -> Column:
    """quality_score over a shared token array (see the *_of note)."""
    len_term = mean_token_length_of(toks) / F.lit(10.0)
    capped_len = F.when(len_term > 1.0, F.lit(1.0)).otherwise(len_term)
    return (
        F.lit(0.4) * stopword_ratio_of(toks)
        + F.lit(0.4) * capped_len
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio(text))
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish score; fixed op order for oracle parity:
    0.4*stopword + 0.4*len_term + 0.2*(1-punct)."""
    return quality_score_of(tokens(text), text)


def sentence_count(text: Column) -> Column:
    """Terminator-run count, floored at 1 (unterminated text is one
    sentence) — the denominator convention readability formulas use.
    NULL text propagates NULL like every other stat here (Spark's
    greatest() SKIPS nulls, so the bare floor would report a phantom
    sentence for textless docs — r4 code review)."""
    return F.when(text.isNull(), F.lit(None).cast("int")).otherwise(
        F.greatest(
            F.lit(1), F.size(F.regexp_extract_all(text, F.lit(r"[.!?]+"), 0))
        )
    )


def syllable_count_of(toks: Column) -> Column:
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.greatest(
            F.lit(1), F.size(F.regexp_extract_all(t, F.lit("[aeiouy]+"), 0))
        ).cast("long"),
    )


def syllable_count(text: Column) -> Column:
    """Σ per-token max(1, vowel-group runs) — the standard cheap
    syllable estimator (every word has ≥1 syllable; consecutive
    vowels count once). Exact integer, so both engines agree."""
    return syllable_count_of(tokens(text))


def flesch_reading_ease_of(toks: Column, text: Column) -> Column:
    """Flesch over a shared token array (see the *_of note)."""
    w = token_count_of(toks).cast("double")
    s = sentence_count(text).cast("double")
    sy = syllable_count_of(toks).cast("double")
    return F.when(
        token_count_of(toks) == 0, F.lit(None).cast("double")
    ).otherwise(F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (sy / w))


def flesch_reading_ease(text: Column) -> Column:
    """Flesch reading ease: 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words); NULL for token-less docs. All inputs are
    exact BIGINT counts and the formula is two IEEE divisions and a
    fixed-order linear combination, so a SQL oracle reproduces it
    bit-for-bit."""
    return flesch_reading_ease_of(tokens(text), text)


def normalize_text(text: Column) -> Column:
    """Dedup canonical form: lower, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Exact-dup fingerprint: md5 of the canonical form."""
    return F.md5(normalize_text(text))


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the canonical token stream.

    Built by zipping the token array with n-1 shifted copies
    (``arrays_zip`` pads the tail with nulls; entries whose last slot
    is null are dropped). The obvious alternative —
    ``transform(sequence(1, k), i -> slice(toks, i, n))`` — re-evaluates
    the whole tokenizer expression per element (no CSE inside lambda
    bodies), turning an O(T) shingle scan into O(T²) regex work per
    document; the zip form evaluates ``toks`` n+1 times total.
    """
    toks = tokens(text)
    cap = F.size(toks)
    parts = [F.slice(toks, i + 1, cap).alias(f"g{i}") for i in range(n)]
    full = F.filter(
        F.arrays_zip(*parts), lambda s: s[f"g{n - 1}"].isNotNull()
    )
    grams = F.transform(
        full, lambda s: F.concat_ws(" ", *[s[f"g{i}"] for i in range(n)])
    )
    return F.array_distinct(grams)


def ngrams(toks: Column, n: int) -> Column:
    """All word n-grams (duplicates KEPT) from a token-ARRAY column.

    Same zip construction as ``shingles`` (no ``array_distinct``), but
    takes the materialized token array rather than raw text: lambda
    bodies get no CSE, so callers compute ``tokens(text)`` once via
    ``withColumn`` and pass the attribute reference.
    """
    cap = F.size(toks)
    parts = [F.slice(toks, i + 1, cap).alias(f"g{i}") for i in range(n)]
    full = F.filter(
        F.arrays_zip(*parts), lambda s: s[f"g{n - 1}"].isNotNull()
    )
    return F.transform(
        full, lambda s: F.concat_ws(" ", *[s[f"g{i}"] for i in range(n)])
    )


def duplicate_fraction(arr: Column) -> Column:
    """1 - distinct/total over an array — the Gopher-style duplicate
    n-gram fraction when fed ``ngrams``; 0.0 for empty arrays."""
    return F.when(F.size(arr) == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(arr)).cast("double") / F.size(arr)
    )


def unique_fraction(arr: Column) -> Column:
    """distinct/total over an array (type-token ratio on tokens)."""
    return F.when(F.size(arr) == 0, F.lit(0.0)).otherwise(
        F.size(F.array_distinct(arr)).cast("double") / F.size(arr)
    )


def top_element_ratio(toks: Column) -> Column:
    """Frequency of the most common element / total (Gopher's
    top-word concentration signal). Nested HOF — O(unique·n) per row,
    pure per-row CPU in the scan task, no shuffle."""
    counts = F.transform(
        F.array_distinct(toks), lambda w: F.size(F.filter(toks, lambda x: x == w))
    )
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.array_max(counts).cast("double") / F.size(toks)
    )


def top_element_ratio_grouped(df, id_col: str, toks_col: str):
    """Long-document variant of ``top_element_ratio``: explode +
    two-level groupBy. Linear in token count but shuffles (token,id)
    rows; the nested-HOF column form is O(unique·n) per row with NO
    shuffle. Measured crossover (SCALE.md lesson 16): HOF wins on
    short docs (~100 tokens), this wins ~10× on 2k-token docs.
    Docs with zero tokens drop out (no rows to group) — rejoin with
    a 0.0 default if full coverage is needed."""
    from pyspark.sql import functions as F  # noqa: PLC0415 (match module style)

    from trello_github_etl_spark.operators.gen import exploded  # noqa: PLC0415

    t = exploded(df, [id_col], F.col(toks_col), "_w")
    cnt = t.groupBy(id_col, "_w").agg(F.count("*").alias("_c"))
    return cnt.groupBy(id_col).agg(
        (F.max("_c").cast("double") / F.sum("_c")).alias("top_element_ratio")
    )


TOP_RATIO_ADAPTIVE_THRESHOLD = 512


def top_element_ratio_adaptive(
    df,
    id_col: str,
    toks_col: str,
    threshold: int = TOP_RATIO_ADAPTIVE_THRESHOLD,
):
    """Length-adaptive top-element ratio: per-row nested HOF below
    ``threshold`` tokens, linear explode+regroup above it (SCALE.md
    lesson 16 — the HOF is O(unique·n) per row and cliffs ~10× on
    2k-token docs; default threshold sits under the measured
    crossover).

    TRUE single-scan design (a union of two length-filtered branches
    reads the corpus twice — a token-length predicate can't push down
    to parquet — and a join-back formulation re-scans the base for
    the probe side): every row explodes exactly once, into either ONE
    marker row carrying the already-computed HOF ratio (short docs)
    or its token rows (long docs, marker token NULL never collides
    with a real token). The two-level groupBy then resolves both row
    kinds — so the shuffle carries long-doc tokens plus one tiny row
    per short doc, with map-side combine on both levels. Returns
    (id_col, top_element_ratio) with full row coverage, 0.0 for
    empty docs, values identical to either pure variant.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415 (match module style)

    toks = F.col(toks_col)
    # coalesce: size(NULL) is NULL, and a NULL routing predicate would
    # silently DROP null-token rows (explode of a NULL array emits
    # nothing). Null toks route to the marker path instead and surface
    # as a row with a NULL ratio — absent data stays visible.
    n = F.coalesce(F.size(toks), F.lit(0))
    marker = F.array(
        F.struct(
            F.lit(None).cast("string").alias("w"),
            top_element_ratio(toks).alias("r"),
        )
    )
    token_rows = F.transform(
        toks,
        lambda w: F.struct(
            w.alias("w"), F.lit(None).cast("double").alias("r")
        ),
    )
    from trello_github_etl_spark.operators.gen import exploded  # noqa: PLC0415

    rows = exploded(
        df, [id_col], F.when(n <= threshold, marker).otherwise(token_rows), "_e"
    )
    cnt = rows.groupBy(id_col, F.col("_e.w").alias("_w")).agg(
        F.count("*").alias("_c"), F.max("_e.r").alias("_r")
    )
    is_tok = F.col("_w").isNotNull()
    return cnt.groupBy(id_col).agg(
        F.coalesce(
            F.max("_r"),
            F.max(F.when(is_tok, F.col("_c"))).cast("double")
            / F.sum(F.when(is_tok, F.col("_c"))),
        ).alias("top_element_ratio")
    )


def collapse_adjacent_repeats(toks: Column) -> Column:
    """Repetition removal: drop tokens equal to their predecessor
    (``a a a b`` → ``a b``). Index lambda + 0-based ``F.get`` (never
    errors out-of-bounds, unlike ``element_at`` under ANSI)."""
    return F.filter(
        toks, lambda x, i: (i == F.lit(0)) | (x != F.get(toks, i - 1))
    )


def winnow_fingerprint(text: Column, n: int = 5) -> Column:
    """Rolling-hash style fingerprint: lexicographic-min md5 over word
    n-gram shingles (1-seed minhash); null for too-short docs."""
    return F.array_min(F.transform(shingles(text, n), F.md5))
