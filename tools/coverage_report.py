#!/usr/bin/env python3
"""Dev-only: regenerate the correctness claim from the newest driver
artifact (CORRECTNESS_r*.json) so doc claims can never drift from what
the driver actually measured.

Usage: python3 tools/coverage_report.py
Prints the one-line claim; paste it into COVERAGE.md / README.md (or
eyeball that they agree). Exits 1 if any row is red so CI-ish use works.
"""
import glob, json, os, re, sys

def main():
    arts = sorted(glob.glob("CORRECTNESS_r*.json"),
                  key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    if not arts:
        print("no CORRECTNESS_r*.json found"); return 1
    latest = arts[-1]
    rows = json.load(open(latest))
    red = sorted(n for n, r in rows.items()
                 if not (r.get("rows_match") and r.get("schema_match")
                         and r.get("hash_match")))
    total = len(rows)
    green = total - len(red)
    claim = f"{green}/{total} green in {os.path.basename(latest)}"
    if red:
        claim += " (red: " + ", ".join(red) + ")"
    print(claim)
    return 1 if red else 0

if __name__ == "__main__":
    sys.exit(main())
