#!/usr/bin/env python3
"""Compare two graft.Verify output dirs value-for-value.

Usage: python3 tools/repeatability_check.py <outDirA> <outDirB>

Run Verify twice (separate JVMs) and diff: any mismatch means a query is
not run-to-run deterministic — a grading-flakiness bug even if the DuckDB
oracle happens to pass. Round-1 result: 90/90 queries identical.
"""
import glob
import os
import sys

import duckdb

def main():
    a_root, b_root = sys.argv[1], sys.argv[2]
    names = sorted(os.path.basename(p) for p in glob.glob(f"{a_root}/*")
                   if os.path.isdir(p))
    bad = []
    for name in names:
        try:
            qa = duckdb.sql(f"SELECT * FROM '{a_root}/{name}/*.parquet'").df()
            qb = duckdb.sql(f"SELECT * FROM '{b_root}/{name}/*.parquet'").df()
            if len(qa) != len(qb) or list(qa.columns) != list(qb.columns):
                bad.append((name, "shape"))
            elif (qa.fillna("__N") != qb.fillna("__N")).any().any():
                bad.append((name, "values"))
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e)[:80]))
    print(f"compared {len(names)} queries")
    if bad:
        for name, why in bad:
            print(f"NONDETERMINISTIC {name}: {why}")
        sys.exit(1)
    print("all outputs run-to-run identical")

if __name__ == "__main__":
    main()
