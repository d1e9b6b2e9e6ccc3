"""r15 probe: ivf_assign_2level's COLD seed phase (the path every
bench-timed run now pays, since bench.py clears the seed memos before
each run — VERDICT r14 #5).

Measures, per cold call on the sf0.1 embeddings corpus:
  - wall time and Spark job count of the seed phase alone
    (auto_seed_centroids + the two internal collects), and
  - end-to-end cold time of the two-level linear-family queries
    (s18/s19/s20/dd35-shaped calls), interleaved old-vs-new when the
    module flag exists.

Usage: python tools/seed2l_probe.py [--sf ...] [--iters 4]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trello_github_etl_spark import registry  # noqa: E402
from trello_github_etl_spark.operators import similarity as sim  # noqa: E402
from trello_github_etl_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def clear():
    sim._CENTROID_CACHE.clear()
    sim._GROUPED_SEED_CACHE.clear()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    registry.load_all()
    spark = get_spark("seed2l_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    from trello_github_etl_spark.queries.llm_q import load_table

    emb = load_table(spark, args.sf, "embeddings").select(
        "vec_id", "embedding"
    )
    tracker = spark.sparkContext.statusTracker()

    def jobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    shapes = ["legacy"]
    if hasattr(sim, "_2LEVEL_SEED_SHAPE"):
        shapes = ["legacy", sim._2LEVEL_SEED_SHAPE]

    # --- seed phase alone: assignment frame built + ONE tiny action
    print("== seed phase (cold, assignment plan build + first action)",
          flush=True)
    for _ in range(args.iters):
        for shape in shapes:
            if hasattr(sim, "_2LEVEL_SEED_SHAPE"):
                sim._2LEVEL_SEED_SHAPE = shape
            clear()
            spark.sparkContext.setJobDescription(f"seed2l:{shape}")
            j0, t0 = jobs(), time.time()
            cents, suffix, k = sim.auto_seed_centroids(
                emb, sim.linear_nlist, "embedding", "vec_id"
            )
            cells = sim.ivf_assign_2level(
                emb, cents, k, "embedding", "vec_id", "probe" + suffix
            )
            t_build = time.time() - t0
            noop(cells.select("vec_id", "cell"))
            t_all = time.time() - t0
            print(
                f"  {shape}: build {t_build:.3f}s total {t_all:.3f}s "
                f"jobs {jobs() - j0}",
                flush=True,
            )
            spark.sparkContext.setJobDescription(None)

    # --- full queries cold, interleaved
    qnames = [
        "s18_mutual_knn_linear",
        "s19_margin_alignment_linear",
        "s20_hard_negatives_linear",
        "dd35_incremental_semdedup_linear",
    ]
    for qn in qnames:
        fn = registry.QUERIES[qn]
        times: dict[str, list[float]] = {s: [] for s in shapes}
        for _ in range(args.iters):
            for shape in shapes:
                if hasattr(sim, "_2LEVEL_SEED_SHAPE"):
                    sim._2LEVEL_SEED_SHAPE = shape
                clear()
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{qn}:{shape}")
                j0, t0 = jobs(), time.time()
                noop(fn(spark, args.sf))
                times[shape].append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)
                if times[shape][-1] == times[shape][0]:
                    pass
        msg = " vs ".join(
            f"{s} median {statistics.median(ts):.3f}s {ts}"
            for s, ts in times.items()
        )
        print(f"{qn}: {msg}", flush=True)


if __name__ == "__main__":
    main()
