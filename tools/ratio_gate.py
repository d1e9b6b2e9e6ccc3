"""The STANDING full-registry ratio/regression gate (VERDICT r8 #1).

The three wholesale correctness sweeps already record per-query wall
time (``secs``) for ALL registered queries at sf0.01 / sf0.1 / sf1 —
but until this gate, nobody computed ratios or round-over-round
deltas outside the 66-query bench headline, so tail regressions like
mm5's 6.1x sf0.1→sf1 ratio or dd23's 4.7x were visible only by
hand-joining artifacts. This tool derives a committed ``RATIOS.json``
from the sweeps each round and FAILS (non-zero exit) when:

1. **scale flag** — a query's sf0.1→sf1 ratio exceeds SCALE_FLAG_X
   (5x on 10x data, i.e. super-linear by more than noise) and the
   query is not in the documented allowlist; or
2. **regression flag** — a query's sf0.1 time regressed more than
   REGRESS_FLAG_X (1.3x) vs the PRIOR round's sweep, after
   normalizing by the median cur/prior ratio across all common
   queries (the median absorbs machine-load drift the way bench.py's
   calibration query does — a real regression moves one query, load
   moves all of them).

Noise guards: a query is only flag-eligible when its current-round
time is >= MIN_SECS (sweep timers have 0.1 s resolution; ratios of
0.2/0.1 are rounding, not plans). Scale ratios use the sweep's
``spark_secs`` field (Spark build+collect only, added r9) — the
total ``secs`` includes the DuckDB oracle + multiset compare, which
grows with sf on ITS own plan (s1's brute-force SQL oracle is 30x
its Spark time at sf1) and would flag half the registry for oracle
cost. Round-over-round regression compares whichever field BOTH
rounds carry (same units on both sides).

ALLOWED_SCALE entries need a reason string — these are the
deliberately-retained ablation receipts and attributed floors whose
docstrings/SCALE.md lessons explain the ratio; the gate keeps them
visible in RATIOS.json rather than silently passing them.

Usage:
    python tools/ratio_gate.py --cur CORRECTNESS_local_r09.json \
        --cur-sf1 CORRECTNESS_sf1.json \
        --prior CORRECTNESS_local_r08_sf01.json \
        --cur-sf01 CORRECTNESS_local_r09_sf01.json
All arguments have r9-era defaults; see --help.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCALE_FLAG_X = 5.0   # sf0.1 -> sf1 (10x data) ratio above this flags
REGRESS_FLAG_X = 1.3  # normalized round-over-round ratio above this flags
MIN_SECS = 1.0       # ignore sub-second queries (0.1 s timer resolution)

# Documented super-linear queries: name -> reason (and where it's
# documented). Kept IN the artifact so they stay visible.
ALLOWED_SCALE = {
    "dd14_semantic_dedup": (
        "static-cell ablation receipt, deliberately retained; dies at "
        "scale by design — production config is dd24 (docstring + r6 "
        "standing terms)"
    ),
    "dd15_semantic_keep_list": (
        "static-cell ablation receipt paired with dd14; production "
        "config is dd26 (docstring + r6 standing terms)"
    ),
    # mm5 was FIXED r9 (ratio 6.1x -> 1.4x, ensure_parallelism on the
    # heavy decode — SCALE.md lesson 39) and is deliberately NOT
    # allowlisted: if it ever flags again, that's a new defect.
    "dd23_incremental_near_dedup": (
        "state ~ corpus asymptotic: the oracle-checkable form rebuilds "
        "the O(corpus) band state per run (a deployment persists it); "
        "each term probes sub-linear and the scan guard landed r9 "
        "(4.7x -> 2.8x), but a larger corpus multiple can legitimately "
        "push the rebuild past 5x. SCALE.md lesson 40"
    ),
}


def load(path):
    with open(path) as fh:
        return json.load(fh)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cur-sf01", default="CORRECTNESS_local_r09_sf01.json",
                    help="current round's sf0.1 sweep")
    ap.add_argument("--cur-sf1", default="CORRECTNESS_sf1.json",
                    help="current round's sf1 sweep")
    ap.add_argument("--prior", default="CORRECTNESS_local_r08_sf01.json",
                    help="prior round's sf0.1 sweep (regression base)")
    ap.add_argument("--out", default="RATIOS.json")
    ap.add_argument("--report-only", action="store_true",
                    help="always exit 0 (for exploratory runs)")
    args = ap.parse_args()

    cur01 = load(os.path.join(ROOT, args.cur_sf01))
    cur1 = load(os.path.join(ROOT, args.cur_sf1))
    prior = load(os.path.join(ROOT, args.prior))

    queries = {}
    scale_flags, regress_flags, allowed_hits = [], [], []

    def spark_t(sweep, q):
        """Spark-only time, falling back to total secs (pre-r9
        artifacts lack spark_secs)."""
        e = sweep.get(q, {})
        return e.get("spark_secs") or e.get("secs")

    def common_t(a, b, q):
        """A (time_a, time_b) pair measured in the SAME units — the
        finest field both artifacts carry for query q."""
        ea, eb = a.get(q, {}), b.get(q, {})
        if ea.get("spark_secs") and eb.get("spark_secs"):
            return ea["spark_secs"], eb["spark_secs"]
        if ea.get("secs") and eb.get("secs"):
            return ea["secs"], eb["secs"]
        return None, None

    # --- load normalization for the regression check
    ratios = []
    for q in cur01:
        c, p = common_t(cur01, prior, q)
        if c and p:
            ratios.append(c / p)
    load_ratio = statistics.median(ratios) if ratios else 1.0

    for q in sorted(set(cur01) | set(cur1)):
        c01, c1 = spark_t(cur01, q), spark_t(cur1, q)
        cr, pr = common_t(cur01, prior, q)
        rec = {"sf01_secs": c01, "sf1_secs": c1, "prior_sf01_secs": pr}

        if c01 and c1:
            rec["scale_ratio"] = round(c1 / c01, 2)
            if c1 >= MIN_SECS and rec["scale_ratio"] > SCALE_FLAG_X:
                if q in ALLOWED_SCALE:
                    rec["scale_allowed"] = ALLOWED_SCALE[q]
                    allowed_hits.append(q)
                else:
                    rec["scale_flag"] = True
                    scale_flags.append(q)

        if cr and pr:
            norm = (cr / pr) / load_ratio
            rec["regress_ratio"] = round(norm, 2)
            rec["regress_from"], rec["regress_to"] = pr, cr
            if cr >= MIN_SECS and norm > REGRESS_FLAG_X:
                rec["regress_flag"] = True
                regress_flags.append(q)

        queries[q] = rec

    out = {
        "inputs": {
            "cur_sf01": args.cur_sf01,
            "cur_sf1": args.cur_sf1,
            "prior_sf01": args.prior,
        },
        "thresholds": {
            "scale_flag_x": SCALE_FLAG_X,
            "regress_flag_x": REGRESS_FLAG_X,
            "min_secs": MIN_SECS,
        },
        "load_ratio_cur_over_prior": round(load_ratio, 3),
        "n_queries": len(queries),
        "scale_flags": scale_flags,
        "regress_flags": regress_flags,
        "allowed_scale_hits": allowed_hits,
        "queries": queries,
    }
    with open(os.path.join(ROOT, args.out), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")

    print(f"{len(queries)} queries; load ratio {load_ratio:.3f}")
    print(f"allowed scale hits: {allowed_hits}")
    if scale_flags:
        for q in scale_flags:
            print(f"SCALE FLAG {q}: sf0.1 {queries[q]['sf01_secs']}s -> "
                  f"sf1 {queries[q]['sf1_secs']}s "
                  f"({queries[q]['scale_ratio']}x on 10x data)")
    if regress_flags:
        for q in regress_flags:
            print(f"REGRESS FLAG {q}: {queries[q]['regress_from']}s -> "
                  f"{queries[q]['regress_to']}s at sf0.1 "
                  f"({queries[q]['regress_ratio']}x load-normalized)")
    if not scale_flags and not regress_flags:
        print("ratio gate PASS")
        return 0
    print("ratio gate FAILED" if not args.report_only
          else "ratio gate: flags above (report-only)")
    return 0 if args.report_only else 1


if __name__ == "__main__":
    sys.exit(main())
