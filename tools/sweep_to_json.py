"""Convert a verify_local.py sweep log into a CORRECTNESS-style JSON artifact.

Usage: python tools/sweep_to_json.py /tmp/sweep_sf1.log CORRECTNESS_sf1.json
"""

from __future__ import annotations

import json
import re
import sys


def main() -> int:
    log_path, out_path = sys.argv[1], sys.argv[2]
    results: dict[str, dict] = {}
    with open(log_path) as fh:
        for line in fh:
            # Strip Spark progress-bar carriage-return segments.
            line = line.split("\r")[-1].strip()
            m = re.match(r"PASS (\w+): (\d+) rows \(([\d.]+)s\)", line)
            if m:
                results[m.group(1)] = {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "spark_rows": int(m.group(2)),
                    "oracle_rows": int(m.group(2)),
                    "secs": float(m.group(3)),
                    "err": None,
                }
                continue
            m = re.match(r"FAIL (\w+): (.*)", line)
            if m:
                results[m.group(1)] = {
                    "rows_match": False,
                    "schema_match": False,
                    "hash_match": False,
                    "err": m.group(2),
                }
                continue
            m = re.match(r"ROWS-ONLY (\w+): (\d+) rows", line)
            if m:
                results[m.group(1)] = {
                    "rows_match": True,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": int(m.group(2)),
                    "err": None,
                }
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=2)
    npass = sum(1 for r in results.values() if r.get("hash_match"))
    print(f"{len(results)} queries, {npass} full pass -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
