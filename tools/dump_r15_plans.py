"""Dump plans/r15/ before/after formatted plans for the r15 changes.

"before" plans are produced by flipping the committed probe hooks to
the pre-r15 values (the code paths are preserved exactly for this
purpose); "after" plans use the production defaults. Iterative
operators expose only checkpoint-backed final plans, so for the CC
loops the BEFORE/AFTER evidence is the round-body phase plan of the
jump shortcut (stepped vs labels lookup) plus the probe job counts.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trello_github_etl_spark import registry  # noqa: E402
from trello_github_etl_spark.operators import dedup, similarity  # noqa: E402
from trello_github_etl_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS = os.path.join(REPO, "plans", "r15")
SF = "/root/testdata/sf0.1"


def dump(df, name):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(PLANS, name), "w") as fh:
        fh.write(f"# {name} — explain('formatted') at {SF}\n\n")
        fh.write(buf.getvalue())
    print("wrote", name, flush=True)


def main() -> None:
    os.makedirs(PLANS, exist_ok=True)
    registry.load_all()
    spark = get_spark("dump_r15_plans")
    spark.sparkContext.setLogLevel("ERROR")

    q = registry.QUERIES

    # dd15/dd14: static-path pin (assignment subtree 3x -> pinned once)
    dedup._SEMDEDUP_STATIC_PIN = None
    dump(q["dd15_semantic_dedup_nlist64"](spark, SF),
         "dd15_semantic_dedup_nlist64_before.txt")
    dedup._SEMDEDUP_STATIC_PIN = "checkpoint"
    dump(q["dd15_semantic_dedup_nlist64"](spark, SF),
         "dd15_semantic_dedup_nlist64_after.txt")
    spark.catalog.clearCache()

    # dd25: star-edge hub shape (agg buffer -> window)
    dedup._STAR_EDGE_SHAPE = "agg"
    dump(q["dd25_lsh_star_edges"](spark, SF), "dd25_lsh_star_edges_before.txt")
    dedup._STAR_EDGE_SHAPE = "window"
    dump(q["dd25_lsh_star_edges"](spark, SF), "dd25_lsh_star_edges_after.txt")

    # s9: kmeans iteration>=2 centroid attach (collect+literal -> scalar subquery)
    similarity._KMEANS_INPLAN_PACK = False
    dump(q["s9_kmeans_refine"](spark, SF), "s9_kmeans_refine_before.txt")
    similarity._KMEANS_INPLAN_PACK = "scalar"
    dump(q["s9_kmeans_refine"](spark, SF), "s9_kmeans_refine_after.txt")

    # jump round body: shortcut lookup through the half-step plan
    # (before: neighbor-min subtree on BOTH sides) vs the round's
    # materialized input labels (after: one subtree)
    from trello_github_etl_spark.queries.llm_q import _augmented_docs

    edges = dedup.lsh_candidate_edges(
        _augmented_docs(spark, SF)).localCheckpoint(eager=True)
    labels = edges.select("doc_a").distinct().select(
        F.col("doc_a").alias("node"), F.col("doc_a").alias("label")
    ).localCheckpoint(eager=True)
    sym = edges.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    neighbor_min = (
        sym.join(labels, sym["v"] == labels["node"], "inner")
        .select(F.col("u").alias("nbr_node"), "label")
        .groupBy("nbr_node").agg(F.min("label").alias("nmin"))
    )
    stepped = labels.join(
        neighbor_min, labels["node"] == neighbor_min["nbr_node"], "left"
    ).select(
        "node",
        F.col("label").alias("old_label"),
        F.least(F.col("label"),
                F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
    )
    for tag, target_src in (("before", stepped), ("after", labels)):
        target = target_src.select(
            F.col("node").alias("t_node"), F.col("label").alias("t_label"))
        joined = stepped.join(
            target, stepped["label"] == target["t_node"], "left"
        ).select(
            "node", "old_label",
            F.coalesce(F.col("t_label"), F.col("label")).alias("label"))
        dump(joined, f"jumpcc_shortcut_round_{tag}.txt")

    # dd6: final checkpoint-backed plan (routing jump -> twostar shows
    # only in the loop structure, but the record keeps both)
    dump(q["dd6_dup_clusters"](spark, SF), "dd6_dup_clusters_after.txt")


if __name__ == "__main__":
    main()
