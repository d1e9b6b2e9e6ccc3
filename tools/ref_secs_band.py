"""ref_secs noise-band analysis (VERDICT r13 #2).

Compares two bench artifacts' totals normalized by their ref_secs
cohorts: the residual after normalization is the band within which a
round-over-round driver delta is machine noise, not code. Run with
any two artifacts that carry {"queries"/"value", "ref_secs"}:

  python tools/ref_secs_band.py BENCH_r13.json BENCH_r14.json
  python tools/ref_secs_band.py BENCH_registry_sf0.1.json \
      BENCH_registry_sf0.1_run2.json   # same-code pair -> pure noise
"""

from __future__ import annotations

import json
import sys


def total(d: dict) -> float:
    if "value" in d:
        return float(d["value"])
    q = d.get("queries") or {}
    return sum(q.values())


def common_total(a: dict, b: dict) -> tuple[float, float, int]:
    qa, qb = a.get("queries") or {}, b.get("queries") or {}
    common = set(qa) & set(qb)
    return (
        sum(qa[k] for k in common),
        sum(qb[k] for k in common),
        len(common),
    )


def main() -> None:
    pa, pb = sys.argv[1], sys.argv[2]
    a = json.load(open(pa))
    b = json.load(open(pb))
    # driver BENCH_r*.json artifacts nest the parsed line
    a = a.get("parsed") or a
    b = b.get("parsed") or b
    ra, rb = a.get("ref_secs"), b.get("ref_secs")
    ta, tb = total(a), total(b)
    print(f"{pa}: total={ta:.2f}s ref_secs={ra}")
    print(f"{pb}: total={tb:.2f}s ref_secs={rb}")
    if a.get("queries") and b.get("queries"):
        ca, cb, n = common_total(a, b)
        if n:
            print(
                f"common {n} queries: {ca:.2f}s vs {cb:.2f}s "
                f"(ratio {cb / ca:.3f})"
            )
            ta, tb = ca, cb
    raw = tb / ta
    ref = rb / ra if ra and rb else float("nan")
    resid = raw / ref if ref == ref and ref else float("nan")
    print(f"raw total ratio:      {raw:.3f}")
    print(f"ref_secs ratio:       {ref:.3f}")
    print(
        f"residual (raw/ref):   {resid:.3f}  "
        "<- the band: |residual-1| is the unexplained noise after "
        "machine-speed normalization"
    )


if __name__ == "__main__":
    main()
