"""Recall@k grid for the ANN serving chain (VERDICT r4 #4).

Recall tests existed (s5 dominance, s8/s13 refine contracts) but no
committed accuracy-vs-cost artifact; this tool measures recall@10
against exact brute force for every approximate retrieval operator
across its parameter knobs and writes RECALL.json:

    {"sf": ..., "k": 10, "n_queries": N,
     "grids": {"s2_lsh": [{"num_planes": 8, "recall_at_10": r,
                           "mean_retrieved": m, "secs": t}, ...], ...}}

Query set and corpus mirror the registered queries exactly
(queries = vec_id % 100 == 0 over the embeddings table; centroids /
PQ seeds are the same lowest-id deterministic conventions), so the
numbers describe the operators as shipped, not a tuned variant.

Usage: python tools/recall_grid.py [--sf /root/testdata/sf0.1]
                                   [--out RECALL.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# the repo that owns this file, never a hardcoded checkout path
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from trello_github_etl_spark.io import load_table  # noqa: E402
from trello_github_etl_spark.operators import similarity  # noqa: E402
from trello_github_etl_spark.session import get_spark  # noqa: E402

K = 10


def _sets(df) -> dict[int, set[int]]:
    """q_id -> retrieved vec_id set (collect is Q×k ids — KB-scale)."""
    out: dict[int, set[int]] = {}
    for r in df.select("q_id", "vec_id").collect():
        out.setdefault(r["q_id"], set()).add(r["vec_id"])
    return out


def _recall(truth: dict[int, set[int]], got: dict[int, set[int]]) -> dict:
    per_q = [
        len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
    ]
    n_ret = [len(got.get(q, set())) for q in truth]
    return {
        "recall_at_10": round(sum(per_q) / len(per_q), 4),
        "mean_retrieved": round(sum(n_ret) / len(n_ret), 2),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="RECALL.json")
    args = ap.parse_args()

    spark = get_spark("recall_grid")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, args.sf, "embeddings").select(
        "vec_id", "embedding"
    )
    qs = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cents = emb.filter(
        F.col("vec_id") < similarity.NUM_CENTROIDS
    ).select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec"))
    seeds = emb.filter(F.col("vec_id") < similarity.PQ_CODEBOOK)

    t0 = time.time()
    truth = _sets(similarity.brute_force_topk(qs, emb, K))
    brute_secs = round(time.time() - t0, 2)
    print(f"brute-force truth: {len(truth)} queries in {brute_secs}s")

    grids: dict[str, list[dict]] = {}

    def run(family: str, knobs: dict, thunk) -> None:
        t0 = time.time()
        rec = _recall(truth, _sets(thunk()))
        rec.update(knobs, secs=round(time.time() - t0, 2))
        grids.setdefault(family, []).append(rec)
        print(f"{family} {knobs}: recall@10={rec['recall_at_10']}"
              f" retrieved={rec['mean_retrieved']} {rec['secs']}s")

    for planes in (4, 8, 12):
        run("s2_lsh", {"num_planes": planes},
            lambda p=planes: similarity.lsh_topk(qs, emb, K, num_planes=p))

    for nprobe in (1, 2, 4, 8):
        run("s4_ivf", {"nprobe": nprobe, "n_centroids": similarity.NUM_CENTROIDS},
            lambda n=nprobe: similarity.ivf_topk(qs, emb, cents, K, nprobe=n))

    for planes in (4, 8, 12):
        run("s5_multiprobe_lsh", {"num_planes": planes, "probes": planes + 1},
            lambda p=planes: similarity.multiprobe_lsh_topk(
                qs, emb, K, num_planes=p))

    for budget in (50, 150, 400):
        run("s6_ivf_budgeted", {"candidate_budget": budget, "nprobe_max": 4},
            lambda b=budget: similarity.ivf_topk_budgeted(
                qs, emb, cents, K, nprobe_max=4, candidate_budget=b))

    run("s8_int8", {"bits": 8},
        lambda: similarity.quantized_topk(qs, emb, K))

    for m in (4, 8, 16):
        run("s12_pq", {"m_subspaces": m, "codebook": similarity.PQ_CODEBOOK},
            lambda mm=m: similarity.pq_topk(
                qs, emb, seeds, K, m=mm, cache_key=f"recall|s12|{mm}|{args.sf}"))

    for shortlist in (10, 25, 50, 100):
        run("s13_pq_rerank", {"shortlist": shortlist, "m_subspaces": 8},
            lambda s=shortlist: similarity.pq_rerank_topk(
                qs, emb, seeds, K, shortlist=s,
                cache_key=f"recall|s13|{args.sf}"))

    for prefix in (8, 16, 32):
        run("s14_matryoshka", {"prefix_dim": prefix, "shortlist": 25},
            lambda p=prefix: similarity.matryoshka_rerank_topk(
                qs, emb, K, shortlist=25, prefix_dim=p))
    for shortlist in (10, 50):
        run("s14_matryoshka", {"prefix_dim": 16, "shortlist": shortlist},
            lambda s=shortlist: similarity.matryoshka_rerank_topk(
                qs, emb, K, shortlist=s, prefix_dim=16))

    artifact = {
        "sf": args.sf,
        "k": K,
        "n_queries": len(truth),
        "brute_force_secs": brute_secs,
        "note": (
            "testdata embeddings are synthetic near-uniform vectors with"
            " no cluster structure, so absolute recall is a lower bound"
            " vs real embedding corpora (uniform data is the hardest ANN"
            " case); the artifact's value is the monotone knob curves"
            " (nprobe/shortlist/prefix_dim up => recall up,"
            " planes up => recall down) and the measured"
            " accuracy-per-second trade between family members"
        ),
        "grids": grids,
    }
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1)
        fh.write("\n")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
