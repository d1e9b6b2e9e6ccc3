"""r15 probe: lsh_candidate_edges agg-vs-window hub shape (r14 ADVICE
on the unspillable per-band collect_list buffer). Interleaved A/B at
the noop sink + edge-set equivalence both ways.

Usage: python tools/staredge_probe.py [--sf /root/testdata/sf0.1] [--iters 5]
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
from trello_github_etl_spark.queries.llm_q import _augmented_docs  # noqa: E402
from trello_github_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    registry.load_all()
    spark = get_spark("staredge_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    docs = _augmented_docs(spark, args.sf)

    def run(shape):
        dedup._STAR_EDGE_SHAPE = shape
        dedup.lsh_candidate_edges(docs).write.format("noop").mode(
            "overwrite"
        ).save()

    times = {"agg": [], "window": []}
    for _ in range(args.iters):
        for shape in times:
            t0 = time.time()
            run(shape)
            times[shape].append(round(time.time() - t0, 3))
    for shape, ts in times.items():
        print(f"{shape}: median {round(statistics.median(ts), 3)}s runs={ts}",
              flush=True)

    dedup._STAR_EDGE_SHAPE = "agg"
    a = dedup.lsh_candidate_edges(docs)
    dedup._STAR_EDGE_SHAPE = "window"
    b = dedup.lsh_candidate_edges(docs)
    print(f"edge diff: {a.exceptAll(b).count() + b.exceptAll(a).count()}",
          flush=True)
    dedup._STAR_EDGE_SHAPE = "agg"


if __name__ == "__main__":
    main()
