"""Giant-cell block-salting receipt (SCALE.md lesson 37).

SemDeDup's own target corpora are dup-heavy: near-identical vectors
share an argmax by construction, so real duplicate families
concentrate into FEW IVF cells, and the plain cell equi-join then
hands one task a cell of c vectors = c²/2 cosine folds while every
other core idles. ``similarity.cell_pairs(blocks=B)`` spreads that
one cell over B² tasks with a bit-identical pair multiset (unit
tests in tests/test_cell_blocks.py prove the multiset; this tool
proves the SPEED claim with a measurement, like SKEW_sf1.json does
for the df-cap levers).

Corpus (sf1-scale, deterministic, generated JVM-side — no RNG
state, no driver loop):
- 20,000 vectors × 64 dims, components xxhash64-uniform in [-1,1]
  (random 64-dim directions: background cosines ~N(0, 1/8), so the
  0.9 pair threshold admits essentially none of them);
- vectors 14000..19999 are a 6,000-member NEAR-DUP family: one base
  direction + 1% jitter — mutual cosines ≈ 0.9997, all far above
  threshold, and all sharing an ivf_assign argmax, i.e. ONE cell
  holding 30% of the corpus while √N auto-seeding spreads the other
  14k over ~142 cells of ~100.

Receipt: the pair stage (cell_pairs → threshold filter → count +
order-insensitive xxhash64 checksum, both forcing every cosine
fold) under the exact caller plans — blocks=1 with semantic_dedup's
per-cell repartition vs blocks=8 with the blocked join's own
(cell, blk, partner) exchange. Asserts the outputs are identical
(count + checksum) and the blocked plan is faster; writes
BLOCKS_sf1.json.

Usage: python tools/blocks_stress.py [--out BLOCKS_sf1.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from trello_github_etl_spark.operators import similarity  # noqa: E402
from trello_github_etl_spark.session import get_spark  # noqa: E402

N_VECS = 20_000
DIM = 64
FAMILY_START = 14_000  # 6,000-member near-dup family
JITTER = 0.01
THRESHOLD = 0.9
BLOCKS = 8


def _component(vec_expr, j):
    """Deterministic uniform [-1, 1] from (vec_id, j) — the same
    no-RNG-state recipe as tools/skew_stress.py's token draw."""
    return (
        F.pmod(F.xxhash64(vec_expr * DIM + j), F.lit(1_000_000))
        / F.lit(1_000_000.0)
        * 2.0
        - 1.0
    )


def build_corpus(spark):
    base = spark.range(0, N_VECS).select(F.col("id").alias("vec_id"))
    idx = F.sequence(F.lit(1), F.lit(DIM))
    background = F.transform(idx, lambda j: _component(F.col("vec_id"), j))
    # family: the FAMILY_START direction + 1% per-member jitter.
    # Cast the anchor to long explicitly — xxhash64 hashes int32 and
    # int64 differently, and the background draw hashes a LONG
    # (skew_stress's r7 clone-text lesson).
    family = F.transform(
        idx,
        lambda j: _component(F.lit(FAMILY_START).cast("long"), j)
        + JITTER * _component(F.col("vec_id"), j),
    )
    emb = base.select(
        "vec_id",
        F.when(F.col("vec_id") >= FAMILY_START, family)
        .otherwise(background)
        .cast("array<float>")
        .alias("embedding"),
    )
    return emb.repartition(32).localCheckpoint(eager=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(_REPO, "BLOCKS_sf1.json"))
    args = ap.parse_args()

    spark = get_spark("blocks_stress")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}

    t0 = time.time()
    emb = build_corpus(spark)
    n = emb.count()
    cents, _suffix, k = similarity.auto_seed_centroids(emb)
    cells = similarity.ivf_assign(emb, cents, 1).localCheckpoint(eager=True)
    occ = (
        cells.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc())
    )
    top = occ.first()
    results["_corpus"] = {
        "vectors": n,
        "dim": DIM,
        "nlist_auto": k,
        "cells_used": occ.count(),
        "giant_cell_occupancy": top["c"],
        "gen_secs": round(time.time() - t0, 2),
    }
    # the near-dup family must concentrate (that is the stressor);
    # a handful of jittered members may straddle to a neighboring
    # seed, hence >= 0.99 not ==
    assert top["c"] >= int((N_VECS - FAMILY_START) * 0.99), results["_corpus"]
    print(f"corpus: {results['_corpus']}", flush=True)

    def pair_stage(blocks: int):
        """The exact caller shapes: semantic_dedup repartitions
        per-cell for the plain join; the blocked join carries its own
        pinned (cell, blk, partner) exchange."""
        src = (
            cells.repartition(k, F.col("cell")) if blocks == 1 else cells
        )
        row = (
            similarity.cell_pairs(src, blocks=blocks)
            .filter(F.col("cos") >= THRESHOLD)
            .agg(
                F.count(F.lit(1)).alias("pairs"),
                # order-insensitive value checksum; decimal(38,0)
                # because summing raw xxhash64 overflows BIGINT
                F.sum(
                    F.xxhash64(
                        F.col("va"), F.col("vb"), F.col("cos")
                    ).cast("decimal(38,0)")
                ).alias("checksum"),
            )
            .first()
        )
        return row["pairs"], str(row["checksum"])

    timings = {}
    for blocks in (1, BLOCKS):
        t0 = time.time()
        pairs, checksum = pair_stage(blocks)
        secs = round(time.time() - t0, 2)
        timings[blocks] = {"pairs": pairs, "checksum": checksum, "secs": secs}
        results[f"pair_stage_blocks{blocks}"] = timings[blocks]
        print(f"blocks={blocks}: {timings[blocks]}", flush=True)

    plain, blocked = timings[1], timings[BLOCKS]
    # ~C(6000,2) family pairs survive the threshold; background
    # random-direction cosines contribute none
    assert plain["pairs"] >= 17_000_000, plain
    assert blocked["pairs"] == plain["pairs"], (plain, blocked)
    assert blocked["checksum"] == plain["checksum"], (plain, blocked)
    # the receipt itself: B² tasks of (c/B)² folds beat one task of
    # c² folds on a 32-core box with wide margin; 0.8 is a noise
    # guard, not the expected ratio
    assert blocked["secs"] <= plain["secs"] * 0.8, (plain, blocked)
    results["_speedup"] = {
        "plain_secs": plain["secs"],
        "blocked_secs": blocked["secs"],
        "ratio": round(plain["secs"] / max(blocked["secs"], 0.01), 1),
        "blocks": BLOCKS,
    }
    print(f"speedup: {results['_speedup']}", flush=True)

    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
