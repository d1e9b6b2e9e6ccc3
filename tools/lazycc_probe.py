"""r15 probe: fuse per-round eager localCheckpoint jobs into the
convergence-count action for the iterative graph loops (guide §1.4 /
§2.4 — fewer actions per round at the same dataflow).

Variants, each run interleaved (alternating per iteration so machine
drift cancels):
  cc_plain   V0 eager (current)  vs V1 lazy (checkpoint fused into count)
  cc_jump    V0 eager            vs V1 lazy   vs V2 lazy + eager `stepped`
             (V2 materializes the half-step so the neighbor-min subtree
              is computed ONCE per round instead of feeding both sides
              of the shortcut self-join)
  cc_twostar V0 eager            vs V1 lazy (checkpoint fused into the
             signature collect)
  pagerank   V0 eager K=2        vs V1 lazy (all rounds fold into the
             consumer action)

Label/rank equivalence asserted via exceptAll both ways on every pair.

Usage: python tools/lazycc_probe.py [--sf /root/testdata/sf0.1]
       [--iters 4] [--which plain,jump,twostar,pagerank]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trello_github_etl_spark import registry  # noqa: E402
from trello_github_etl_spark.operators import dedup  # noqa: E402
from trello_github_etl_spark.queries.llm_q import (  # noqa: E402
    PAGERANK_BAND_DF,
    _augmented_docs,
)
from trello_github_etl_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def interleaved(variants: dict, iters: int):
    """variants: name -> thunk. Runs name order per iteration."""
    times: dict[str, list[float]] = {n: [] for n in variants}
    for i in range(iters):
        for n, fn in variants.items():
            t0 = time.time()
            fn()
            times[n].append(round(time.time() - t0, 3))
    for n, ts in times.items():
        print(f"  {n}: median {round(statistics.median(ts), 3)}s runs={ts}",
              flush=True)
    return times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--which", default="plain,jump,twostar,pagerank")
    args = ap.parse_args()
    which = set(args.which.split(","))

    registry.load_all()
    spark = get_spark("lazycc_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    docs = _augmented_docs(spark, args.sf)
    edges = dedup.lsh_candidate_edges(docs).localCheckpoint(eager=True)
    print(f"edges materialized: {edges.count()}", flush=True)

    # flip the module-level default that _truncate_lineage consults
    def eager_mode(on: bool):
        dedup._TRUNCATE_EAGER_OVERRIDE = on

    if "plain" in which:
        print("cc_plain:", flush=True)
        interleaved(
            {
                "V0_eager": lambda: (eager_mode(True),
                                     noop(dedup.connected_components(edges)))[1],
                "V1_lazy": lambda: (eager_mode(False),
                                    noop(dedup.connected_components(edges)))[1],
            },
            args.iters,
        )
        eager_mode(True)
        a = dedup.connected_components(edges)
        eager_mode(False)
        b = dedup.connected_components(edges)
        print(f"  label diff: {a.exceptAll(b).count() + b.exceptAll(a).count()}",
              flush=True)

    if "jump" in which:
        print("cc_jump:", flush=True)
        interleaved(
            {
                "V0_eager": lambda: (eager_mode(True), setattr(dedup, "_JUMP_PIN_STEPPED", False),
                                     noop(dedup.connected_components_jump(edges)))[2],
                "V1_lazy": lambda: (eager_mode(False), setattr(dedup, "_JUMP_PIN_STEPPED", False),
                                    noop(dedup.connected_components_jump(edges)))[2],
                "V2_lazy_pin": lambda: (eager_mode(False), setattr(dedup, "_JUMP_PIN_STEPPED", True),
                                        noop(dedup.connected_components_jump(edges)))[2],
            },
            args.iters,
        )
        eager_mode(True)
        dedup._JUMP_PIN_STEPPED = False
        a = dedup.connected_components_jump(edges)
        eager_mode(False)
        dedup._JUMP_PIN_STEPPED = True
        b = dedup.connected_components_jump(edges)
        print(f"  label diff: {a.exceptAll(b).count() + b.exceptAll(a).count()}",
              flush=True)
        dedup._JUMP_PIN_STEPPED = True

    if "twostar" in which:
        print("cc_twostar:", flush=True)
        interleaved(
            {
                "V0_eager": lambda: (eager_mode(True),
                                     noop(dedup.connected_components_twostar(edges)))[1],
                "V1_lazy": lambda: (eager_mode(False),
                                    noop(dedup.connected_components_twostar(edges)))[1],
            },
            args.iters,
        )
        eager_mode(True)
        a = dedup.connected_components_twostar(edges)
        eager_mode(False)
        b = dedup.connected_components_twostar(edges)
        print(f"  label diff: {a.exceptAll(b).count() + b.exceptAll(a).count()}",
              flush=True)

    if "pagerank" in which:
        print("pagerank:", flush=True)
        pairs = dedup.minhash_lsh_pairs(
            docs, max_band_df=PAGERANK_BAND_DF
        ).localCheckpoint(eager=True)
        print(f"  capped pairs: {pairs.count()}", flush=True)
        interleaved(
            {
                "V0_eager": lambda: (eager_mode(True),
                                     noop(dedup.pagerank(pairs)))[1],
                "V1_lazy": lambda: (eager_mode(False),
                                    noop(dedup.pagerank(pairs)))[1],
            },
            args.iters,
        )
        eager_mode(True)
        a = dedup.pagerank(pairs)
        eager_mode(False)
        b = dedup.pagerank(pairs)
        print(f"  rank diff: {a.exceptAll(b).count() + b.exceptAll(a).count()}",
              flush=True)

    eager_mode(True)


if __name__ == "__main__":
    main()
