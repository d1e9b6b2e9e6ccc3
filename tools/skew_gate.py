"""The STANDING skew gate (VERDICT r7 #1): correctness + bench on the
deterministic skewed fixture, every round.

r7's one-off skew stress (tools/skew_stress.py) caught two real
scale-killers but ran only when someone remembered. This gate makes
the Zipfian / giant-dup-family / giant-embedding-cluster corpus a
third standing scale next to sf0.01 and sf0.1:

1. builds ``.data/skew`` via tools/make_skew.py if absent
   (deterministic — same bytes every run);
2. runs tools/verify_local.py over the dedup/similarity lever
   queries (the operators whose 100 TB claims depend on skew
   behavior) and writes ``CORRECTNESS_skew.json``;
3. runs bench.py on the same set (with calibration_secs) and writes
   ``BENCH_skew.json``.

Every giant-family lever the repo advertises is thereby re-receipted
per round on data where it ENGAGES: dd27's band-df cap drops the
1,000-member family's bands, dd25/dd6/dd9/dd22 recover the family as
one component through O(d) star edges, dd16's cap bounds PageRank's
pair graph, dd24/dd26/s15 meet a 400-member single-cell embedding
cluster, dd7/dd17/dd21 and the winnowing pair dd12/dd13 meet 20%-df
boilerplate shingles (the gate asserts dd13's fingerprint-df cap
actually ENGAGES — its kept-pair count must differ from dd12's
uncapped count on the fixture, r8 VERDICT #4).

Usage: python tools/skew_gate.py [--skip-bench]
Exit non-zero iff any correctness row fails.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SKEW_DIR = os.path.join(ROOT, ".data", "skew")

# The dedup/similarity lever set: every query whose scale story is
# about SKEW (caps, star edges, block salting, adaptive cells) plus
# the exact-dup baseline. Relational/text queries are gated at
# sf0.01/sf0.1 where their plans don't depend on skew levers.
SKEW_QUERIES = [
    "dd1_exact_dups",
    "dd5_jaccard_pairs",
    "dd6_dup_clusters",
    "dd7_jaccard_df_capped",
    "dd9_dup_clusters_twostar",
    "dd12_winnow_pairs",
    "dd13_winnow_df_capped",
    "dd16_pagerank_dup_graph",
    "dd17_simhash_hamming_pairs",
    "dd21_repeated_ngram_coverage",
    "dd22_dup_cluster_keepers",
    "dd24_semantic_dedup_auto",
    "dd25_lsh_star_edges",
    "dd26_semantic_dedup_blocked",
    "dd27_lsh_pairs_capped",
    "dd28_span_dedup",
    "dd29_containment_pairs",
    "s15_mutual_knn_graph",
]

# Bench subset: the lever queries with meaningful data work. dd6/dd9/
# dd22/dd16 are excluded for bench.py's standing reason — iterative
# jobs are ~90% fixed per-round scheduling overhead at this scale, so
# their medians measure the scheduler, not the levers (they remain in
# the correctness sweep above).
BENCH_QUERIES = [
    "dd1_exact_dups",
    "dd7_jaccard_df_capped",
    "dd12_winnow_pairs",
    "dd13_winnow_df_capped",
    "dd17_simhash_hamming_pairs",
    "dd21_repeated_ngram_coverage",
    "dd24_semantic_dedup_auto",
    "dd25_lsh_star_edges",
    "dd26_semantic_dedup_blocked",
    "dd27_lsh_pairs_capped",
    "s15_mutual_knn_graph",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()

    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "make_skew.py")],
        check=True,
    )

    # --- correctness sweep -> CORRECTNESS_skew.json
    log_path = os.path.join(ROOT, ".data", "skew_sweep.log")
    with open(log_path, "w") as log:
        rc = subprocess.run(
            [
                sys.executable,
                os.path.join(ROOT, "tools", "verify_local.py"),
                "--sf", SKEW_DIR, *SKEW_QUERIES,
            ],
            stdout=log, stderr=subprocess.STDOUT,
        ).returncode
    subprocess.run(
        [
            sys.executable, os.path.join(ROOT, "tools", "sweep_to_json.py"),
            log_path, os.path.join(ROOT, "CORRECTNESS_skew.json"),
        ],
        check=True,
    )
    if rc != 0:
        print("SKEW CORRECTNESS FAILED — see CORRECTNESS_skew.json")
        return rc

    # --- cap-engagement assertion (r8 VERDICT #4): dd13's
    # fingerprint-df cap must actually bite on the fixture — a
    # kept-pair count equal to dd12's uncapped count would mean the
    # fixture's hot fingerprints sit below the cap and the gate is
    # exercising dead configuration.
    with open(os.path.join(ROOT, "CORRECTNESS_skew.json")) as fh:
        corr = json.load(fh)
    try:
        n12 = corr["dd12_winnow_pairs"]["spark_rows"]
        n13 = corr["dd13_winnow_df_capped"]["spark_rows"]
    except KeyError as missing:
        # a partial artifact or an edited SKEW_QUERIES list must fail
        # with the gate's diagnostic voice, not a raw traceback (the
        # same hardening the bench-phase JSON parse got, r8 advice)
        print(
            f"SKEW GATE FAILED: cap-engagement check needs "
            f"dd12/dd13 rows in CORRECTNESS_skew.json ({missing} "
            f"missing — partial sweep or edited SKEW_QUERIES?)"
        )
        return 1
    if n12 == n13:
        print(
            f"SKEW GATE FAILED: dd13's df cap did not engage "
            f"(dd12 pairs == dd13 pairs == {n12})"
        )
        return 1
    print(f"dd13 cap engaged: dd12 {n12} pairs -> dd13 {n13} pairs")

    # --- bench -> BENCH_skew.json (bench.py's stdout JSON line, which
    # carries calibration_secs; the stderr spread detail is embedded)
    if not args.skip_bench:
        env = dict(
            os.environ,
            SPARK_GRAFT_SF_DIR=SKEW_DIR,
            SPARK_GRAFT_BENCH_QUERIES=",".join(BENCH_QUERIES),
        )
        # No check=True, and scan stdout lines from the END for the
        # JSON record (r8 advice): a bench failure or a stray trailing
        # print must surface the captured output, not die on an
        # uncaught CalledProcessError/JSONDecodeError with the
        # diagnosis swallowed.
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            env=env, capture_output=True, text=True,
        )
        if proc.returncode != 0:
            print(f"SKEW BENCH FAILED (exit {proc.returncode})")
            print("--- bench stdout ---\n" + proc.stdout)
            print("--- bench stderr ---\n" + proc.stderr)
            return proc.returncode or 1
        rec = None
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(parsed, dict) and "metric" in parsed:
                rec = parsed
                break
        if rec is None:
            print("SKEW BENCH FAILED: no JSON metric line in stdout")
            print("--- bench stdout ---\n" + proc.stdout)
            print("--- bench stderr ---\n" + proc.stderr)
            return 1
        rec["sf"] = "skew"  # bench derives sf from the dir name
        for sline in proc.stderr.splitlines():
            if sline.startswith("# spread: "):
                rec["spread_detail"] = json.loads(sline[len("# spread: "):])
        with open(os.path.join(ROOT, "BENCH_skew.json"), "w") as fh:
            json.dump(rec, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"BENCH_skew.json: total {rec['value']}s, "
              f"calibration {rec['calibration_secs']}s")

    print("skew gate PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
