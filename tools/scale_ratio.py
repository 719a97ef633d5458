#!/usr/bin/env python3
"""Scaling-curve analysis: per-query time ratio between two local bench
file artifacts (bench_<sf>.json, written by graft.Bench — NOT the
driver's truncated BENCH_r files).

Usage: python3 tools/scale_ratio.py bench_sf0.1.json bench_graft_sf1.json [data_ratio]

data_ratio defaults to 10 (sf1 = 10x sf0.1). For memoized/pipeline
queries the COLD (rep-1) time is compared — the warm median measures a
checkpoint read, not the pipeline. Queries are bucketed:
  sub-linear   ratio <  0.5 * data_ratio   (broadcast/bounded plans)
  ~linear      ratio in [0.5, 1.5] * data_ratio
  SUPER-LINEAR ratio >  1.5 * data_ratio   <- the flag list
Sub-second baselines are reported but not flagged (fixed overhead
dominates them, the ratio is meaningless).
"""
import json
import sys

COLD_QUERIES = {"etl_events_replay", "etl_tracking_replay",
                "x01_training_set", "x02_shard_manifest"}


def load(path):
    with open(path) as f:
        doc = json.loads(f.read())
    med, cold = doc["queries"], doc.get("cold", {})
    return {q: (cold.get(q, t) if q in COLD_QUERIES else t)
            for q, t in med.items()}


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    shared = sorted(set(a) & set(b))
    rows = [(b[q] / a[q], q, a[q], b[q]) for q in shared
            if a[q] > 0 and b[q] > 0]
    broken = [q for q in shared if b[q] < 0 <= a[q]]
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] > 1.5 * data_ratio and r[2] >= 1.0]
    small = [r for r in rows if r[2] < 1.0]
    print(f"shared {len(shared)}  data_ratio {data_ratio:g}x  "
          f"total {sum(r[2] for r in rows):.1f}s -> {sum(r[3] for r in rows):.1f}s "
          f"({sum(r[3] for r in rows)/max(sum(r[2] for r in rows),1e-9):.1f}x)")
    if broken:
        print("BROKEN at target sf: " + ", ".join(broken))
    print(f"\nSUPER-LINEAR (> {1.5*data_ratio:g}x, baseline >= 1s): "
          f"{len(flagged)}")
    for ratio, q, ta, tb in flagged:
        print(f"  {q:32s} {ta:8.2f}s -> {tb:8.2f}s  ({ratio:.1f}x)")
    print(f"\nall queries with baseline >= 1s, by ratio:")
    for ratio, q, ta, tb in rows:
        if ta >= 1.0:
            print(f"  {q:32s} {ta:8.2f}s -> {tb:8.2f}s  ({ratio:5.1f}x)")
    print(f"\nsub-1s baselines (unflagged; overhead-dominated): "
          f"{len(small)} queries, worst ratios:")
    for ratio, q, ta, tb in small[:8]:
        print(f"  {q:32s} {ta:8.3f}s -> {tb:8.3f}s  ({ratio:5.1f}x)")


if __name__ == "__main__":
    main()
