"""Stage-attribution probe for the two 100x-suspect narrow paths
(VERDICT r7 #4): t1_token_stats (6.1x on 10x data) and f3_title_split
(6.0x). Times decomposed variants at a given sf_dir so SCALE.md can
say WHERE the time goes instead of guessing.

t1 variants:
  scan        — length(text) only (parquet scan + string materialize)
  tokenize    — size(tokens(text)) only (adds the regexp_extract_all)
  full        — the registered query (4 stats, each calling tokens())
  hand_cse    — tokenize ONCE into a column, compute the same 4 stats
                from the shared array (tests whether codegen subexpr
                elimination already dedupes the 4 regex scans)

f3 variants:
  scan        — length(text) only
  split       — size(split(text)) only (the word split)
  full        — the registered native higher-order fold
  pandas_udf@N — the reference pandas-UDF implementation at Arrow
                batch size N (the lever note VERDICT asks for)

Each variant runs 3x to a noop write; median reported, plus the
bench-style calibration constant. ONE Spark job at a time — do not
run while anything else is on the machine.

Usage: python tools/narrow_probe.py [--sf .data/sf1] [--out JSON]
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

from trello_github_etl_spark.functions import split_title, text  # noqa: E402
from trello_github_etl_spark.io import load_table  # noqa: E402
from trello_github_etl_spark.operators import textstats  # noqa: E402
from trello_github_etl_spark.operators.parallel import ensure_parallelism  # noqa: E402
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
    ap.add_argument("--sf", default=os.path.join(_REPO, ".data", "sf1"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark("narrow_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = ensure_parallelism(load_table(spark, args.sf, "documents"))
    docs.count()  # warm footers
    # warm the python worker pool so the first pandas-UDF variant
    # doesn't eat the fork cost
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    t = F.col("text")
    out: dict[str, dict] = {"sf": args.sf}

    cal = []
    for _ in range(3):
        t0 = time.time()
        spark.range(0, 50_000_000, 1, 32).selectExpr(
            "sum(cast(xxhash64(id) as decimal(38,0))) AS h"
        ).write.format("noop").mode("overwrite").save()
        cal.append(time.time() - t0)
    out["calibration_secs"] = round(statistics.median(cal), 3)

    # ---- t1
    tk = textstats.tokens(t)
    stop_arr = F.array(*[F.lit(s) for s in textstats.STOPWORDS])
    shared = docs.select("doc_id", tk.alias("tk"), t.alias("text"))

    def stats_from(arr, txt):
        n = F.size(arr)
        total = F.aggregate(
            arr, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
        )
        n_stop = F.size(F.filter(arr, lambda w: F.array_contains(stop_arr, w)))
        return [
            n.alias("n_tokens"),
            F.when(n == 0, F.lit(0.0))
            .otherwise(total.cast("double") / n)
            .alias("mean_token_len"),
            F.when(n == 0, F.lit(0.0))
            .otherwise(n_stop.cast("double") / n)
            .alias("stop_ratio"),
            textstats.punct_ratio(txt).alias("punct_ratio"),
        ]

    out["t1"] = {
        "scan": _timed(docs.select("doc_id", F.length(t).alias("n"))),
        "tokenize": _timed(docs.select("doc_id", F.size(tk).alias("n"))),
        "full": _timed(
            docs.select(
                "doc_id",
                textstats.token_count(t).alias("n_tokens"),
                textstats.mean_token_length(t).alias("mean_token_len"),
                textstats.stopword_ratio(t).alias("stop_ratio"),
                textstats.punct_ratio(t).alias("punct_ratio"),
            )
        ),
        "hand_cse": _timed(
            shared.select("doc_id", *stats_from(F.col("tk"), F.col("text")))
        ),
    }
    print(f"t1: {out['t1']}", flush=True)

    # ---- f3
    split_words = F.split(t, r"\s")
    out["f3"] = {
        "scan": _timed(docs.select("doc_id", F.length(t).alias("n"))),
        "split": _timed(docs.select("doc_id", F.size(split_words).alias("n"))),
        "full": _timed(
            docs.select(
                "doc_id",
                text.split_title_desc(t)["title"].alias("title"),
                text.split_title_desc(t)["desc"].alias("desc"),
            )
        ),
    }
    for batch in (2_000, 10_000, 50_000):
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch)
        )
        out["f3"][f"pandas_udf@{batch}"] = _timed(
            docs.select(
                "doc_id", split_title.split_title_desc_udf(t).alias("s")
            ).select("doc_id", "s.title", "s.desc")
        )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    print(f"f3: {out['f3']}", flush=True)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
