#!/usr/bin/env python3
"""Dev-only mimic of the driver's DuckDB oracle compare.

NOT part of the engine (the library is pure Scala/Spark). Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout"
  python3 tools/check.py /root/testdata/sf0.01 /tmp/vout [query ...]
(optional trailing query names restrict the compare — pairs with
Verify's own optional query-name args for fast dev iteration)
"""
import sys, json, glob, os
import duckdb

def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:  # dev filter, pairs with Verify's optional query-name args
        oracle = {n: q for n, q in oracle.items() if n in only}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_bad += 1; continue
        # mirror the driver harness: it row-sorts both frames by all
        # columns before hashing, and pandas sort_values CRASHES on
        # array/struct columns (lexsort_indexer → factorize →
        # "unhashable type: numpy.ndarray"). Any shape the driver
        # cannot sort must fail HERE too, not pass by luck of order.
        try:
            got = got.sort_values(list(got.columns)).reset_index(drop=True)
            want = want.sort_values(list(want.columns)).reset_index(drop=True)
        except Exception as e:
            print(f"FAIL {name}: row-sort (driver harness would err): {e}")
            n_bad += 1; continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                import pandas as pd
                eq = (a.astype(str) == b.astype(str))
            except Exception:
                eq = a == b
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch = (c, i, a.iloc[i], b.iloc[i]); break
        if mismatch:
            c, i, av, bv = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={av!r} oracle={bv!r}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
