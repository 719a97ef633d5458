#!/usr/bin/env python3
"""Per-query comparison of two BENCH_r{N}.json files.

The driver stores only the trailing bytes of the bench stdout (`tail`),
which can truncate the JSON line mid-object, so per-query times are
recovered with a regex over `"name":float` pairs rather than json.loads.

Usage: python3 tools/bench_diff.py BENCH_r01.json BENCH_r02.json
Flags queries regressing by more than 1.5x (and lists the biggest
improvements). Exit code 0 always — the flag list is advisory; local
machine-load variance at sub-second scale is real (see SCALE.md).
"""
import json
import re
import sys

PAIR = re.compile(r'"([A-Za-z_][A-Za-z0-9_]*)":(-?\d+(?:\.\d+)?)')
META = {"value", "sf", "n", "rc", "cpus", "failed"}


def load(path):
    with open(path) as f:
        doc = json.load(f)
    src = doc.get("tail") or ""
    out = {}
    for name, val in PAIR.findall(src):
        if name not in META:
            out[name] = float(val)
    return out


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    shared = sorted(set(a) & set(b))
    if not shared:
        sys.exit("no shared queries parsed — check the inputs")
    # a query that stopped working is the worst regression there is —
    # surface it first and keep the -1 sentinels OUT of the arithmetic
    # (totals must not have failures subtracted, ratios must not be inf)
    broken = [q for q in shared if b[q] < 0 <= a[q]]
    chronic = [q for q in shared if a[q] < 0 and b[q] < 0]
    ok = [q for q in shared if a[q] >= 0 and b[q] >= 0]
    rows = sorted(((b[q] / a[q], q, a[q], b[q]) for q in ok if a[q] > 0),
                  reverse=True)
    regressions = [r for r in rows if r[0] > 1.5 and r[3] >= 0.5]
    print(f"shared queries: {len(shared)}   "
          f"total {sum(a[q] for q in ok):.1f}s -> "
          f"{sum(b[q] for q in ok):.1f}s  (over {len(ok)} passing in both)")
    if broken:
        print(f"\nBROKEN in {sys.argv[2]} (passed before, -1 now): "
              + ", ".join(broken))
    if chronic:
        print("\nfailing in BOTH rounds (-1 twice — chronically broken): "
              + ", ".join(chronic))
    print(f"\nregressions >1.5x (ignoring sub-0.5s noise): "
          f"{len(regressions)}")
    for ratio, q, ta, tb in regressions:
        print(f"  {q:32s} {ta:8.2f}s -> {tb:8.2f}s  ({ratio:.2f}x)")
    print("\nbiggest improvements:")
    for ratio, q, ta, tb in rows[::-1][:8]:
        if ratio < 1:
            print(f"  {q:32s} {ta:8.2f}s -> {tb:8.2f}s  ({ratio:.2f}x)")
    only_b = sorted(set(b) - set(a))
    if only_b:
        print(f"\nnew queries in {sys.argv[2]}: {', '.join(only_b)}")


if __name__ == "__main__":
    main()
