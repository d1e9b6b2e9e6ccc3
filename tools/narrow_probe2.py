"""Stage-attribution probe for the two r8-flagged scale ratios
(VERDICT r8 #2/#3): mm5_image_ahash_pairs (6.1x on 10x data) and
dd23_incremental_near_dedup (4.7x). Times decomposed variants at a
given sf_dir so SCALE.md says WHERE the time goes.

mm5 variants:
  scan          — payload length sum only (parquet scan + union)
  ahash@scan    — image_ahash on the scan's native partitioning
                  (the registered query's shape; sf1 = 2 partitions)
  ahash@N       — image_ahash after repartition(N) (the
                  worker-fan-out vs per-core-compute trade that
                  multimodal_q._media_table documents for the CHEAP
                  mm1 decode; mm5's 60-md5-per-doc decode is the
                  heavy case)
  pairs_from_fps — hamming_pairs on precomputed fingerprints
                  (isolates the band join + popcount verify)
  full          — the registered query (post-r9 this includes the
                  ensure_parallelism guard, so full ≈ ahash@32 +
                  pairs rather than ahash@scan + pairs)

dd23 variants:
  corpus_sig    — lsh_band_keys over the full corpus (the state-build
                  side: tokenize/shingle/minhash of EVERY corpus doc)
  batch_sig     — lsh_band_keys over the batch only
  state_distinct — corpus band_key distinct (the state dedup shuffle)
  probe_join    — full operator given precomputed corpus bands
  full          — the registered query (corpus_sig + probe_join)

Each variant runs 3x to a noop write; median reported, plus bench's
calibration constant. ONE Spark job at a time.

Usage: python tools/narrow_probe2.py [--sf .data/sf1] [--out JSON]
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
from trello_github_etl_spark.operators import dedup  # noqa: E402
from trello_github_etl_spark.operators.multimodal import image_ahash  # noqa: E402
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

    spark = get_spark("narrow_probe2")
    from trello_github_etl_spark.queries.llm_q import _augmented_docs
    from trello_github_etl_spark.queries.multimodal_q import (
        mm5_image_ahash_pairs,
    )
    from trello_github_etl_spark.queries.llm_q import (
        dd23_incremental_near_dedup,
    )

    out = {"sf": args.sf, "mm5": {}, "dd23": {}}

    # calibration: same fixed-size job bench.py uses
    cal = spark.range(0, 20_000_000, 1, 32).select(
        F.sum(F.xxhash64("id").cast("decimal(38,0)")).alias("h")
    )
    out["calibration_secs"] = _timed(cal)

    # ---- mm5 ----
    media = _augmented_docs(spark, args.sf).select(
        F.col("doc_id").alias("media_id"), F.col("text").alias("payload")
    )
    out["mm5"]["scan_partitions"] = media.rdd.getNumPartitions()
    out["mm5"]["scan"] = _timed(
        media.select(F.sum(F.length("payload")).alias("b"))
    )
    out["mm5"]["ahash@scan"] = _timed(image_ahash(media))
    for n in (8, 32):
        out["mm5"][f"ahash@{n}"] = _timed(image_ahash(media.repartition(n)))
    fps = image_ahash(media.repartition(32)).localCheckpoint(eager=True)
    out["mm5"]["pairs_from_fps"] = _timed(
        dedup.hamming_pairs(
            fps, "ahash", dedup.HAMMING_SIG_BITS,
            id_col="media_id", max_band_df=dedup.HAMMING_BAND_DF,
        )
    )
    out["mm5"]["full"] = _timed(mm5_image_ahash_pairs(spark, args.sf))

    # ---- dd23 ----
    docs = load_table(spark, args.sf, "documents")
    corpus_bands = dedup.lsh_band_keys(docs).select("band_key")
    out["dd23"]["corpus_sig"] = _timed(corpus_bands)
    out["dd23"]["state_distinct"] = _timed(corpus_bands.distinct())
    fresh = docs.filter(F.col("doc_id") % 9 == 4)
    batch = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        .unionByName(
            fresh.select(
                (F.col("doc_id") + 300000).alias("doc_id"),
                F.reverse(F.col("text")).alias("text"),
            )
        )
    )
    out["dd23"]["batch_sig"] = _timed(dedup.lsh_band_keys(batch))
    pinned_state = corpus_bands.localCheckpoint(eager=True)
    out["dd23"]["probe_join"] = _timed(
        dedup.incremental_near_dedup(batch, pinned_state)
    )
    out["dd23"]["full"] = _timed(dd23_incremental_near_dedup(spark, args.sf))

    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
