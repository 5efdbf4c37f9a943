#!/usr/bin/env python3
"""Regenerate SCALE_VERIFY.json from a check_oracle.py run at sf0.1.

Usage: python3 tools/make_scale_verify.py <verifyOutDir> <checkOutputTxt> <note>

Reads the PASS/FAIL lines from the check output and the row counts from the
Spark parquet dumps, and writes the SCALE_VERIFY.json artifact the judge
reads (family summary + per-query status).
"""
import json
import re
import sys


def main(out_dir: str, check_txt: str, note: str) -> int:
    queries = {}
    n_pass = 0
    n_total = 0
    with open(check_txt) as f:
        for line in f:
            m = re.match(r"^PASS (\S+) \((\d+) rows\)", line)
            if m:
                n_total += 1
                n_pass += 1
                queries[m.group(1)] = {"status": "PASS",
                                       "rows": int(m.group(2))}
                continue
            m = re.match(r"^FAIL ([^:\s]+)", line)
            if m:
                n_total += 1
                queries[m.group(1)] = {"status": "FAIL", "rows": None}
    doc = {
        "family": "FULL SUITE (every oracled query)",
        "n_queries": n_total,
        "n_pass": n_pass,
        "note": note,
        "queries": dict(sorted(queries.items())),
    }
    with open("SCALE_VERIFY.json", "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"SCALE_VERIFY.json: {n_pass}/{n_total} PASS")
    return 0 if n_pass == n_total else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
