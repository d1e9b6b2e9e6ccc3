"""Optimization-round probe: time queries and capture formatted plans.

Usage:
  python tools/opt_probe.py --tag before --sf /root/testdata/sf0.1 \
      --runs 3 dd6_dup_clusters dd16_pagerank_dup_graph

For each named query: runs the noop-sink write (guide §1.4) ``--runs``
times, prints per-run and median seconds, and writes
``plans/<round>/<name>_<tag>.txt`` with the ``explain("formatted")``
output (the judge-facing plan evidence). The timed action is identical
to bench.py's (build inside the timer, noop write, cache cleared
between queries), so numbers are comparable to BENCH artifacts.
"""

from __future__ import annotations

import argparse
import io
import os
import statistics
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trello_github_etl_spark import registry  # noqa: E402
from trello_github_etl_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--round", default="r14")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-plan", action="store_true")
    args = ap.parse_args()

    registry.load_all()
    spark = get_spark("opt_probe")
    spark.sparkContext.setLogLevel("ERROR")
    # Same warmup as bench.py: JVM + parquet footers + python workers.
    try:
        registry.QUERIES["o4_top10_orders"](spark, args.sf).collect()
    except Exception:
        registry.QUERIES["t1_token_stats"](spark, args.sf).collect()
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    plans_dir = os.path.join(REPO, "plans", args.round)
    os.makedirs(plans_dir, exist_ok=True)

    for name in args.names:
        if name not in registry.QUERIES:
            print(f"{name}: NOT REGISTERED", flush=True)
            continue
        spark.sparkContext.setJobDescription(f"opt_probe:{name}")
        runs = []
        for _ in range(args.runs):
            t0 = time.time()
            df = registry.QUERIES[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
        med = round(statistics.median(runs), 3)
        print(f"{name}: median {med}s runs={runs}", flush=True)
        if not args.no_plan:
            df = registry.QUERIES[name](spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(plans_dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as fh:
                fh.write(
                    f"# {name} — explain('formatted') at {args.sf} "
                    f"({args.tag})\n# median {med}s runs={runs}\n\n"
                )
                fh.write(buf.getvalue())
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
