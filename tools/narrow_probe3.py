"""Stage-attribution probe for the two remaining >5x entries in the
50x scale sweep (r9 VERDICT #6): t1_token_stats (12.6x at sf5) and
dd21_repeated_ngram_coverage (5.3x). Times decomposed variants at a
given sf_dir so SCALE.md says WHERE the time goes — the lesson-42
question is whether these are the saturated-narrow-map asymptote
(fixed overhead amortized away, per-row work now visible at its
true ~data-growth slope) or a hidden super-linear stage.

t1 variants (documents, ensure_parallelism — the registered shape):
  scan       — sum(length(text)): parquet scan + round-robin only
  tokenize   — sum(size(tokens(text))): scan + the regex token pass
  full       — the registered query (adds the three *_of HOF stats
               + punct ratio over the materialized token array)

dd21 variants (augmented docs, ensure_parallelism):
  positions  — tokenize -> 8-gram posexplode -> h60 hash (count agg
               to force materialization without a collect)
  group_hot  — positions + groupBy(h) collect_list + >=min_count
               filter (the corpus-wide count shuffle)
  flagged    — group_hot + the explode back to flagged positions
  full       — the registered query (adds the per-doc sorted
               interval-union window + final aggregate)

Each variant runs 3x to a noop write; median reported, plus bench's
calibration constant. ONE Spark job at a time.

Usage: python tools/narrow_probe3.py [--sf DIR] [--out JSON]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from trello_github_etl_spark.io import load_table  # noqa: E402
from trello_github_etl_spark.operators import textstats  # noqa: E402
from trello_github_etl_spark.operators.dedup import (  # noqa: E402
    REPEAT_NGRAM_MIN_COUNT,
    REPEAT_NGRAM_N,
    _token_hash60,
)
from trello_github_etl_spark.operators.gen import (  # noqa: E402
    exploded,
    pos_exploded,
)
from trello_github_etl_spark.operators.parallel import (  # noqa: E402
    ensure_parallelism,
)
from trello_github_etl_spark.operators.textstats import (  # noqa: E402
    ngrams,
    tokens,
)
from trello_github_etl_spark.session import get_spark  # noqa: E402


def _timed(df, runs: int = 3) -> float:
    samples = []
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.time() - t0)
    return round(statistics.median(samples), 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.path.join(_REPO, ".data", "sf5"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark("narrow_probe3")
    spark.sparkContext.setLogLevel("ERROR")
    from trello_github_etl_spark.queries.llm_q import (
        _augmented_docs,
        dd21_repeated_ngram_coverage,
        t1_token_stats,
    )

    out = {"sf": args.sf, "t1": {}, "dd21": {}}
    cal = spark.range(0, 20_000_000, 1, 32).select(
        F.sum(F.xxhash64("id").cast("decimal(38,0)")).alias("h")
    )
    out["calibration_secs"] = _timed(cal)

    # ---- t1 ----
    docs = ensure_parallelism(load_table(spark, args.sf, "documents"))
    out["t1"]["scan"] = _timed(
        docs.select(F.sum(F.length("text")).alias("b"))
    )
    out["t1"]["tokenize"] = _timed(
        docs.select(
            F.sum(F.size(textstats.tokens(F.col("text")))).alias("n")
        )
    )
    out["t1"]["full"] = _timed(t1_token_stats(spark, args.sf))

    # ---- dd21 ----
    aug = ensure_parallelism(_augmented_docs(spark, args.sf))
    toks = aug.select(
        "doc_id", tokens(F.col("text")).alias("tk")
    ).withColumn("n_tokens", F.size("tk"))
    positions = pos_exploded(
        toks,
        ["doc_id", "n_tokens"],
        ngrams(F.col("tk"), REPEAT_NGRAM_N),
        "pos",
        "g",
    ).select(
        "doc_id", "n_tokens", "pos", _token_hash60(F.col("g")).alias("h")
    )
    # aggregate over h, NOT count(*): Count(1) references no columns,
    # so column pruning would drop the md5/conv hash projection and
    # this stage would silently omit the per-ngram hash work it
    # exists to measure (post-r10 code review). decimal(38,0) — a
    # bigint sum of 60-bit hashes overflows (the xxhash64 lesson).
    out["dd21"]["positions"] = _timed(
        positions.groupBy().agg(
            F.sum(F.col("h").cast("decimal(38,0)")).alias("n")
        )
    )
    grouped = (
        positions.groupBy("h")
        .agg(F.collect_list(F.struct("doc_id", "n_tokens", "pos")).alias("ps"))
        .filter(F.size("ps") >= REPEAT_NGRAM_MIN_COUNT)
    )
    out["dd21"]["group_hot"] = _timed(
        grouped.groupBy().agg(F.count("*").alias("n"))
    )
    flagged = exploded(grouped, [], F.col("ps"), "p").select(
        "p.doc_id", "p.n_tokens", "p.pos"
    )
    out["dd21"]["flagged"] = _timed(flagged)
    out["dd21"]["full"] = _timed(dd21_repeated_ngram_coverage(spark, args.sf))

    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
