#!/usr/bin/env python3
"""Scaling-curve analysis: per-query time ratio between two local bench
file artifacts (bench_<sf>.json, written by graft.Bench — NOT the
driver's truncated BENCH_r files).

Usage: python3 tools/scale_ratio.py bench_sf0.1.json bench_graft_sf1.json [data_ratio]

data_ratio defaults to 10 (sf1 = 10x sf0.1).

Lanes (round-12 protocol — the memo de-asterisk): every artifact
carries both a "cold" map (sweep-1 time per query) and the per-query
median. Memoized lineages (x01's curate->pack fixpoint, the etl corpus
parse, the centroid/BPE/CM memos) amortize across warm reps, so a
WARM-baseline vs COLD-target comparison manufactures fake
super-linearity (x01 read as 695x when its cold-vs-cold ratio is ~2x).
This tool therefore compares LIKE FOR LIKE:

  cold lane    cold(baseline)  vs cold(target)  — the pipeline shape
  median lane  median(baseline) vs median(target) — the steady state

and FLAGS only queries super-linear in BOTH lanes (a real scale-killer
scales badly cold AND warm; a memo artifact diverges across lanes, a
load spike on one sweep diverges too). Single-rep artifacts have
median == cold, which is exactly right: both lanes then compare the
same honest number. Buckets per lane:
  sub-linear   ratio <  0.5 * data_ratio   (broadcast/bounded plans)
  ~linear      ratio in [0.5, 1.5] * data_ratio
  SUPER-LINEAR ratio >  1.5 * data_ratio   <- flagged if in both lanes
Sub-second baselines are reported but not flagged (fixed overhead
dominates them, the ratio is meaningless).
"""
import json
import sys


def load(path):
    with open(path) as f:
        doc = json.loads(f.read())
    med = doc["queries"]
    cold = doc.get("cold", {})
    return ({q: cold.get(q, t) for q, t in med.items()}, dict(med))


def ratios(a, b, shared):
    return {q: b[q] / a[q] for q in shared if a.get(q, 0) > 0 and b.get(q, 0) > 0}


def main():
    (a_cold, a_med) = load(sys.argv[1])
    (b_cold, b_med) = load(sys.argv[2])
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    lim = 1.5 * data_ratio
    shared = sorted(set(a_med) & set(b_med))
    broken = [q for q in shared if b_med[q] < 0 <= a_med[q]]
    r_cold = ratios(a_cold, b_cold, shared)
    r_med = ratios(a_med, b_med, shared)

    tc_a = sum(a_cold[q] for q in r_cold)
    tc_b = sum(b_cold[q] for q in r_cold)
    tm_a = sum(a_med[q] for q in r_med)
    tm_b = sum(b_med[q] for q in r_med)
    print(f"shared {len(shared)}  data_ratio {data_ratio:g}x")
    print(f"cold   lane total {tc_a:8.1f}s -> {tc_b:8.1f}s  ({tc_b/max(tc_a,1e-9):.2f}x)")
    print(f"median lane total {tm_a:8.1f}s -> {tm_b:8.1f}s  ({tm_b/max(tm_a,1e-9):.2f}x)")
    if broken:
        print("BROKEN at target sf: " + ", ".join(broken))

    # flag: super-linear in BOTH lanes with a >= 1s cold baseline
    flagged = sorted(
        ((r_cold[q], q) for q in r_cold
         if r_cold[q] > lim and r_med.get(q, 0) > lim and a_cold[q] >= 1.0),
        reverse=True)
    print(f"\nSUPER-LINEAR in BOTH lanes (> {lim:g}x, cold baseline >= 1s): "
          f"{len(flagged)}")
    for ratio, q in flagged:
        print(f"  {q:32s} cold {a_cold[q]:8.2f}s -> {b_cold[q]:8.2f}s ({ratio:.1f}x)"
              f"  median {a_med[q]:.2f}s -> {b_med[q]:.2f}s ({r_med[q]:.1f}x)")

    # single-lane outliers: explained, not flagged — printed so a real
    # regression hiding behind a memo can still be seen and adjudicated
    one_lane = sorted(
        ((max(r_cold.get(q, 0), r_med.get(q, 0)), q) for q in shared
         if q in r_cold and q in r_med and a_cold[q] >= 1.0
         and (r_cold[q] > lim) != (r_med[q] > lim)),
        reverse=True)
    if one_lane:
        print(f"\nsuper-linear in ONE lane only (memo/load-spike shape, unflagged): {len(one_lane)}")
        for _, q in one_lane:
            print(f"  {q:32s} cold {r_cold[q]:6.1f}x  median {r_med[q]:6.1f}x")

    print("\nall queries with cold baseline >= 1s, by cold ratio:")
    for ratio, q in sorted(((r, q) for q, r in r_cold.items() if a_cold[q] >= 1.0), reverse=True):
        print(f"  {q:32s} {a_cold[q]:8.2f}s -> {b_cold[q]:8.2f}s  ({ratio:5.1f}x)")

    small = sorted(((r, q) for q, r in r_cold.items() if a_cold[q] < 1.0), reverse=True)
    print(f"\nsub-1s cold baselines (unflagged; overhead-dominated): "
          f"{len(small)} queries, worst cold ratios:")
    for ratio, q in small[:8]:
        print(f"  {q:32s} {a_cold[q]:8.3f}s -> {b_cold[q]:8.3f}s  ({ratio:5.1f}x)")


if __name__ == "__main__":
    main()
