"""Convert a verify_local.py sweep log into a CORRECTNESS-style JSON artifact.

verify_local.py emits one machine-readable "RESULT {json}" line per
query; this converter copies those records VERBATIM (ADVICE r3: the
old converter re-inferred oracle_rows/schema_match from the human
'PASS' line, which would silently fabricate matches if verify_local's
semantics ever drifted).  The legacy regex path remains only as a
fallback for pre-r4 logs and tags its records "inferred": true.

Usage: python tools/sweep_to_json.py /tmp/sweep_sf1.log CORRECTNESS_sf1.json
"""

from __future__ import annotations

import json
import re
import sys


def main() -> int:
    log_path, out_path = sys.argv[1], sys.argv[2]
    results: dict[str, dict] = {}
    inferred: dict[str, dict] = {}
    with open(log_path) as fh:
        for line in fh:
            # Strip Spark progress-bar carriage-return segments.
            line = line.split("\r")[-1].strip()
            if line.startswith("RESULT {"):
                try:
                    rec = json.loads(line[len("RESULT ") :])
                except json.JSONDecodeError:
                    continue
                results.update(rec)
                continue
            # Legacy fallback (pre-r4 logs without RESULT lines).
            m = re.match(r"PASS (\w+): (\d+) rows \(([\d.]+)s\)", line)
            if m:
                inferred[m.group(1)] = {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "spark_rows": int(m.group(2)),
                    "oracle_rows": int(m.group(2)),
                    "secs": float(m.group(3)),
                    "err": None,
                    "inferred": True,
                }
                continue
            m = re.match(r"FAIL (\w+): (.*)", line)
            if m:
                inferred[m.group(1)] = {
                    "rows_match": False,
                    "schema_match": False,
                    "hash_match": False,
                    "err": m.group(2),
                    "inferred": True,
                }
                continue
            m = re.match(r"ROWS-ONLY (\w+): (\d+) rows", line)
            if m:
                inferred[m.group(1)] = {
                    "rows_match": True,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": int(m.group(2)),
                    "err": None,
                    "inferred": True,
                }
    # Structured records win; inferred ones only fill gaps.
    for name, rec in inferred.items():
        results.setdefault(name, rec)
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=2)
    npass = sum(1 for r in results.values() if r.get("hash_match"))
    n_inf = sum(1 for r in results.values() if r.get("inferred"))
    extra = f" ({n_inf} inferred from legacy log lines)" if n_inf else ""
    print(f"{len(results)} queries, {npass} full pass{extra} -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
