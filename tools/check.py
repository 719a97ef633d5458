#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mirroring the driver's
DuckDB compare: for each query, read the Spark-written parquet from
Verify's outDir and compare (columns sorted by name, rows sorted, values
exact) against DuckDB running the oracle SQL over the same test tables.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Dev tooling only — not part of the shipped engine.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def fresh_con(sf_dir, mem_gb):
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem_gb}GB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def main(sf_dir, out_dir):
    # Cap the pool well under RAM: duckdb's default limit is 80% of the
    # MACHINE, so two concurrent check/probe processes (or one beside a
    # running Spark sweep) can jointly exhaust physical memory and die
    # on a 16KB malloc ("bad allocation") — observed round 19 when a
    # probe ran beside the chained sweep. Forcing a low cap makes duckdb
    # spill to disk instead; no oracle needs more (the heaviest, s06,
    # peaks ~1GB). min() with half of physical RAM: on a <48GB machine a
    # flat 24GB would RAISE the cap above the 80% default (or above
    # physical memory entirely), making the failure mode more likely.
    ram_gb = (os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")) // (1 << 30)
    mem_gb = min(24, max(1, ram_gb // 2))
    # ONE FRESH CONNECTION PER ORACLE, mirroring the driver harness (one
    # python process per query). Round 14 made sharing impossible anyway:
    # the fenced oracles (DataOps.fenced — s06-s10, the etl replays) lead
    # with SET memory_limit/temp_directory statements that are meant to
    # be process-scoped; on a shared connection the 8GB cap leaks onto
    # every LATER unfenced oracle (g06's 12GB peak then OOMs under a cap
    # meant for s07) and a second fenced query hits DuckDB's "cannot
    # switch temporary directory after the current one has been used".
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        try:
            if not os.path.isdir(f"{out_dir}/{name}"):
                # Verify was run with a name-prefix filter; not a failure
                n_skip += 1
                continue
            con = fresh_con(sf_dir, mem_gb)
            try:
                exp = con.sql(sql).df()
            except duckdb.OutOfMemoryException:
                # "Failed to allocate block of N bytes (bad allocation)"
                # is a transient co-scheduling casualty (a check running
                # beside a Spark sweep — the r12 s07–s09 class), not a
                # property of the oracle: retry once on a fresh
                # connection with a tighter pool so the second attempt
                # spills instead of dying.
                con.close()
                con = fresh_con(sf_dir, 4)
                exp = con.sql(sql).df()
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            exp = exp[sorted(exp.columns)]
            got = got[sorted(got.columns)]
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
                n_fail += 1
                continue
            # The driver's hash tolerates integer-WIDTH differences
            # (int32 vs int64: 15 r3-green queries differ that way) but is
            # red on KIND differences: DuckDB widening an integer SUM to
            # HUGEINT (-> float64/object in pandas) while Spark writes
            # int64 shipped value-identical hash-red rows (q55, round 3;
            # q16/q17/q45/q47, round 1). Compare dtype KINDS before values
            # so that class fails loudly here first.
            def kind(dt):
                k = dt.kind
                return "int" if k in ("i", "u") else k
            dt_bad = [(c, str(exp[c].dtype), str(got[c].dtype))
                      for c in exp.columns
                      if kind(exp[c].dtype) != kind(got[c].dtype)]
            if dt_bad:
                print(f"FAIL {name}: dtypes differ (col, oracle, spark): {dt_bad}")
                n_fail += 1
                continue
            er = sorted([tuple(norm(v) for v in r) for r in exp.itertuples(index=False)],
                        key=lambda r: tuple(str(x) for x in r))
            gr = sorted([tuple(norm(v) for v in r) for r in got.itertuples(index=False)],
                        key=lambda r: tuple(str(x) for x in r))
            if len(er) != len(gr):
                print(f"FAIL {name}: rows exp={len(er)} got={len(gr)}")
                n_fail += 1
                continue
            bad = [(a, b) for a, b in zip(er, gr) if a != b]
            if bad:
                print(f"FAIL {name}: {len(bad)}/{len(er)} rows differ; first: exp={bad[0][0]} got={bad[0][1]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(er)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
        finally:
            try:
                con.close()  # per-query connection: release its pool
            except Exception:  # noqa: BLE001
                pass
    skipped = f" / {n_skip} not dumped" if n_skip else ""
    print(f"== {n_pass} pass / {n_fail} fail{skipped} ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
