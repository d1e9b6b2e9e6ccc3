"""r15 probe: fuse per-round eager localCheckpoint jobs into the
convergence-count action for the iterative graph loops (guide §1.4 /
§2.4 — fewer actions per round at the same dataflow).

Variants, run interleaved (alternating per iteration so machine drift
cancels). "old" forces every _truncate_lineage call eager — exactly
the pre-r15 behavior (every call site was eager=True). "new" is the
production default (per-round truncations lazy, fused into the
convergence action; structural inits eager where dual consumers
require it).

  cc_plain   old vs new
  cc_jump    old(eager, shortcut through the half-step plan) vs
             new(lazy, shortcut through the round's materialized
             input labels) vs pin(lazy, eagerly pinned half-step)
  cc_twostar old vs new (checkpoint fused into the signature collect)
  pagerank   old vs new (mid-loop truncations lazy, final eager)

Label/rank equivalence asserted via exceptAll both ways on old-vs-new.

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


def set_mode(eager_override, shortcut="labels"):
    dedup._TRUNCATE_EAGER_OVERRIDE = eager_override
    dedup._JUMP_SHORTCUT = shortcut


def interleaved(variants: dict, iters: int):
    times: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(iters):
        for n, fn in variants.items():
            t0 = time.time()
            fn()
            times[n].append(round(time.time() - t0, 3))
    for n, ts in times.items():
        print(f"  {n}: median {round(statistics.median(ts), 3)}s runs={ts}",
              flush=True)
    return times


def diff(a, b):
    return a.exceptAll(b).count() + b.exceptAll(a).count()


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

    def variant(fn, eager_override, shortcut="labels"):
        def run():
            set_mode(eager_override, shortcut)
            spark.sparkContext.setJobDescription(
                f"lazycc:{fn.__name__}:eager={eager_override}:{shortcut}")
            noop(fn())
            spark.sparkContext.setJobDescription(None)
        return run

    try:
        if "plain" in which:
            print("cc_plain:", flush=True)
            interleaved({
                "old_eager": variant(
                    lambda: dedup.connected_components(edges), True),
                "new_lazy": variant(
                    lambda: dedup.connected_components(edges), None),
            }, args.iters)
            set_mode(True)
            a = dedup.connected_components(edges)
            set_mode(None)
            b = dedup.connected_components(edges)
            print(f"  label diff old-vs-new: {diff(a, b)}", flush=True)

        if "jump" in which:
            print("cc_jump:", flush=True)
            interleaved({
                "old_eager_stepped": variant(
                    lambda: dedup.connected_components_jump(edges),
                    True, "stepped"),
                "new_lazy_lagged": variant(
                    lambda: dedup.connected_components_jump(edges),
                    None, "labels"),
                "lazy_pin": variant(
                    lambda: dedup.connected_components_jump(edges),
                    None, "pinned"),
            }, args.iters)
            set_mode(True, "stepped")
            a = dedup.connected_components_jump(edges)
            set_mode(None, "labels")
            b = dedup.connected_components_jump(edges)
            print(f"  label diff old-vs-new: {diff(a, b)}", flush=True)

        if "twostar" in which:
            print("cc_twostar:", flush=True)
            interleaved({
                "old_eager": variant(
                    lambda: dedup.connected_components_twostar(edges), True),
                "new_lazy": variant(
                    lambda: dedup.connected_components_twostar(edges), None),
            }, args.iters)
            set_mode(True)
            a = dedup.connected_components_twostar(edges)
            set_mode(None)
            b = dedup.connected_components_twostar(edges)
            print(f"  label diff old-vs-new: {diff(a, b)}", flush=True)

        if "pagerank" in which:
            print("pagerank:", flush=True)
            pairs = dedup.minhash_lsh_pairs(
                docs, max_band_df=PAGERANK_BAND_DF
            ).localCheckpoint(eager=True)
            print(f"  capped pairs: {pairs.count()}", flush=True)
            interleaved({
                "old_eager": variant(lambda: dedup.pagerank(pairs), True),
                "new_lazy": variant(lambda: dedup.pagerank(pairs), None),
            }, args.iters)
            set_mode(True)
            a = dedup.pagerank(pairs)
            set_mode(None)
            b = dedup.pagerank(pairs)
            print(f"  rank diff old-vs-new: {diff(a, b)}", flush=True)
    finally:
        set_mode(None, "labels")


if __name__ == "__main__":
    main()
