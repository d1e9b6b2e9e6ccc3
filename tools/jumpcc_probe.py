"""Pointer-jump CC A/B: pre-partition the static edge table by the
neighbor-min join key (the dd16 degree-join hoist pattern).

Old: edges = sym.cache() — unpartitioned; at cluster scale every
round's edges⋈labels join shuffles BOTH sides (edges re-shuffled by v
each round although it never changes).
New: edges = sym.repartition("v").cache() — one shuffle before the
loop; each round's join reuses the cached hash partitioning and only
the labels table moves.

Runs both variants INTERLEAVED on the real dd6 edge set at --sf,
checks labels identical (exceptAll both ways), and dumps the round-1
neighbor-min join plan for both variants with autoBroadcast disabled
(the cluster-scale join shape) to plans/r14/jumpcc_round_plan_*.txt.

Usage: python tools/jumpcc_probe.py --sf /root/testdata/sf0.1 --iters 3
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

from pyspark.sql import DataFrame, functions as F

from trello_github_etl_spark.operators import dedup
from trello_github_etl_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def jump_variant(pairs: DataFrame, variant: str, max_iter: int = 32) -> DataFrame:
    e = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    if variant == "new":
        edges = sym.repartition("v").cache()
    else:
        edges = sym.cache()
    labels = (
        edges.select("u").distinct()
        .select(F.col("u").alias("node"), F.col("u").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["v"] == labels["node"], "inner")
            .select(F.col("u").alias("nbr_node"), "label")
            .groupBy("nbr_node")
            .agg(F.min("label").alias("nmin"))
        )
        stepped = labels.join(
            neighbor_min, labels["node"] == neighbor_min["nbr_node"], "left"
        ).select(
            "node",
            F.col("label").alias("old_label"),
            F.least(
                F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
            ).alias("label"),
        )
        target = stepped.select(
            F.col("node").alias("t_node"), F.col("label").alias("t_label")
        )
        joined = stepped.join(
            target, stepped["label"] == target["t_node"], "left"
        ).select(
            "node",
            "old_label",
            F.coalesce(F.col("t_label"), F.col("label")).alias("label"),
        ).localCheckpoint(eager=True)
        changed = joined.filter(F.col("label") != F.col("old_label")).count()
        labels = joined.select("node", "label")
        if changed == 0:
            break
    else:
        edges.unpersist()
        raise RuntimeError("did not converge")
    edges.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("jumpcc_probe")
    spark.sparkContext.setLogLevel("ERROR")

    from trello_github_etl_spark import registry

    registry.load_all()
    from trello_github_etl_spark.queries.llm_q import _augmented_docs

    docs = _augmented_docs(spark, args.sf)
    pairs = dedup.lsh_candidate_edges(docs, "text").localCheckpoint(eager=True)
    print(f"edge set: {pairs.count()} rows", flush=True)

    base = jump_variant(pairs, "old").localCheckpoint(eager=True)
    got = jump_variant(pairs, "new")
    print(
        f"equivalence old vs new: exceptAll "
        f"{got.exceptAll(base).count()}/{base.exceptAll(got).count()}",
        flush=True,
    )

    # round-1 join plan under the cluster-scale (no-broadcast) regime
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for variant in ("old", "new"):
        e = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        edges = (
            sym.repartition("v").cache() if variant == "new" else sym.cache()
        )
        labels = edges.select("u").distinct().select(
            F.col("u").alias("node"), F.col("u").alias("label")
        )
        nm = (
            edges.join(labels, edges["v"] == labels["node"], "inner")
            .select(F.col("u").alias("nbr_node"), "label")
            .groupBy("nbr_node")
            .agg(F.min("label").alias("nmin"))
        )
        nm.count()  # populate the cache so the cached partitioning is real
        buf = io.StringIO()
        with redirect_stdout(buf):
            nm.explain("formatted")
        path = os.path.join(
            REPO, "plans", "r14", f"jumpcc_round_plan_{'before' if variant == 'old' else 'after'}.txt"
        )
        with open(path, "w") as fh:
            fh.write(
                f"# pointer-jump CC round-1 neighbor-min join ({variant}: "
                f"{'sym.cache()' if variant == 'old' else 'sym.repartition(v).cache()'}), "
                "autoBroadcastJoinThreshold=-1 (cluster-scale shape), real sf0.1 dd6 edge set\n\n"
                + buf.getvalue()
            )
        edges.unpersist()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)

    times: dict[str, list[float]] = {"old": [], "new": []}
    for i in range(args.iters):
        for v in ("old", "new"):
            spark.sparkContext.setJobDescription(f"jumpcc:{v}:iter{i}")
            t0 = time.time()
            jump_variant(pairs, v).write.format("noop").mode(
                "overwrite"
            ).save()
            times[v].append(round(time.time() - t0, 3))
            print(f"iter {i} {v}: {times[v][-1]}s", flush=True)
    for v in ("old", "new"):
        print(
            f"{v}: median {statistics.median(times[v]):.3f}s runs={times[v]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
