"""r15 probe for dd15_semantic_dedup_nlist64 (VERDICT r14 #4): phase
split + static-path pin variants.

Phases (each timed with the noop sink, guide §1.4):
  assign   — the ivf_assign narrow pass alone (one corpus scan)
  pairs    — within-cell pair join + threshold filter
  full     — the registered query

Variants of the full query, interleaved:
  none        — status quo (assignment subtree planned on the pair
                join's two sides AND the verdict join)
  persist     — cells.persist() (keeps size stats; lazy)
  checkpoint  — cells.localCheckpoint(eager=True) (extra job, loses
                size stats)

Verdict-frame equivalence asserted via exceptAll both ways.

Usage: python tools/dd15_probe.py [--sf /root/testdata/sf0.1] [--iters 4]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trello_github_etl_spark import registry  # noqa: E402
from trello_github_etl_spark.io import load_table  # noqa: E402
from trello_github_etl_spark.operators import dedup, similarity  # noqa: E402
from trello_github_etl_spark.queries.llm_q import SEMDEDUP_THRESHOLD  # noqa: E402
from trello_github_etl_spark.operators.parallel import ensure_parallelism  # noqa: E402
from trello_github_etl_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, iters, fn):
    ts = []
    for _ in range(iters):
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 3))
    print(f"  {label}: median {round(statistics.median(ts), 3)}s runs={ts}",
          flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    registry.load_all()
    spark = get_spark("dd15_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    emb = load_table(spark, args.sf, "embeddings").select("vec_id", "embedding")
    dups = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = ensure_parallelism(emb.unionByName(dups))
    cents = emb.filter(F.col("vec_id") < 64).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )

    print("phases:", flush=True)
    timed("assign", args.iters, lambda: noop(
        similarity.ivf_assign(corpus, cents, 1)))
    timed("pairs", args.iters, lambda: noop(
        similarity.cell_pairs(similarity.ivf_assign(corpus, cents, 1))
        .filter(F.col("cos") >= SEMDEDUP_THRESHOLD)))

    def full(pin):
        def run():
            dedup._SEMDEDUP_STATIC_PIN = pin
            # fresh each run: bench clears these per timed run too
            similarity._CENTROID_CACHE.clear()
            similarity._GROUPED_SEED_CACHE.clear()
            noop(registry.QUERIES["dd15_semantic_dedup_nlist64"](spark, args.sf))
            spark.catalog.clearCache()
        return run

    print("full-query pin variants (interleaved):", flush=True)
    times = {n: [] for n in ("none", "persist", "checkpoint")}
    for _ in range(args.iters):
        for n in times:
            t0 = time.time()
            full(n)()
            times[n].append(round(time.time() - t0, 3))
    for n, ts in times.items():
        print(f"  {n}: median {round(statistics.median(ts), 3)}s runs={ts}",
              flush=True)

    dedup._SEMDEDUP_STATIC_PIN = None
    a = registry.QUERIES["dd15_semantic_dedup_nlist64"](spark, args.sf)
    dedup._SEMDEDUP_STATIC_PIN = "persist"
    b = registry.QUERIES["dd15_semantic_dedup_nlist64"](spark, args.sf)
    dedup._SEMDEDUP_STATIC_PIN = "checkpoint"
    c = registry.QUERIES["dd15_semantic_dedup_nlist64"](spark, args.sf)
    d1 = a.exceptAll(b).count() + b.exceptAll(a).count()
    d2 = a.exceptAll(c).count() + c.exceptAll(a).count()
    print(f"verdict-frame diffs: persist={d1} checkpoint={d2}", flush=True)
    dedup._SEMDEDUP_STATIC_PIN = None


if __name__ == "__main__":
    main()
