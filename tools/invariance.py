#!/usr/bin/env python3
"""Partitioning-invariance diff of two Verify dumps (e.g. 8 vs 32 cores):
for every query present in BOTH outDirs, compare the parquet results
(columns sorted by name, rows sorted, NaN-normalized, exact values).

Usage: python3 tools/invariance.py <outDirA> <outDirB>
Dev tooling only — not part of the shipped engine.
"""
import os
import sys

import duckdb


def main(a_dir, b_dir):
    con = duckdb.connect()
    names = sorted(set(os.listdir(a_dir)) & set(os.listdir(b_dir)))
    names = [n for n in names
             if os.path.isdir(f"{a_dir}/{n}") and os.path.isdir(f"{b_dir}/{n}")]
    n_same = 0
    diffs = []
    for name in names:
        a = con.sql(f"SELECT * FROM read_parquet('{a_dir}/{name}/*.parquet')").df()
        b = con.sql(f"SELECT * FROM read_parquet('{b_dir}/{name}/*.parquet')").df()
        a = a[sorted(a.columns)]
        b = b[sorted(b.columns)]
        if list(a.columns) != list(b.columns):
            diffs.append((name, "columns"))
            print(f"DIFF {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            diffs.append((name, f"rows {len(a)} vs {len(b)}"))
            print(f"DIFF {name}: rows {len(a)} vs {len(b)}")
            continue
        # sort rows by every column; stringify so NaN==NaN and mixed
        # object columns stay comparable (the round-9 Some(NaN) lesson)
        asv = a.astype(str).sort_values(by=list(a.columns)).reset_index(drop=True)
        bsv = b.astype(str).sort_values(by=list(b.columns)).reset_index(drop=True)
        if asv.equals(bsv):
            n_same += 1
        else:
            neq = (asv != bsv).any(axis=1)
            first = asv[neq].index[0]
            diffs.append((name, f"values from row {first}"))
            print(f"DIFF {name}: first differing sorted row {first}")
    print(f"== {n_same}/{len(names)} identical, {len(diffs)} differ ==")
    return 1 if diffs else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
