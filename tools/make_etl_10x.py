#!/usr/bin/env python3
"""Build an N-times replicated copy of the reference CDC CSV corpus for
the ETL-half scaling run (VERDICT r12 item 5) — the make_sf1.py
convention applied to the 881-file corpus: key-shift `oid__id` per
replica so document identities are replica-distinct and the pipeline's
keep-last dedup / explode / sink-upsert structure scales linearly
(10x input -> 10x output), the way a real 10x corpus would.

NOT correctness testdata — the replay oracle and all specs still run on
the pristine /root/reference corpus. This exists solely to measure
pipeline rows/s and sink txn scaling at 1x vs 10x.

Construction per replica r:
  - oid__id -> f"{r}{oid}" (33-char string; stays a string key).
  - file name -> f"r{r}_{orig}" so the fileName column (basename) stays
    a total order: all r0 files sort before r1, original order kept
    within a replica.
  - every other byte of every field is preserved verbatim (the Python-
    literal events array must reach the parser unchanged).

CSV handling uses the csv module (fields contain commas, quotes, and
potentially newlines — a line-regex would corrupt them). Each source
file is parsed ONCE; rows are formatted once with a sentinel in the oid
slot and the per-replica output is a cheap bytes replace.

Usage: python3 tools/make_etl_10x.py [DST] [N] [HOT_FRAC]
       (default /tmp/etl_corpus_10x, N=10, HOT_FRAC=0)

HOT_FRAC > 0 plants key skew (VERDICT r13 ask 6): that fraction of ALL
rows (deterministic: every round(1/HOT_FRAC)-th row in global row
order) keeps a single fixed hot `oid__id` instead of its replica-
shifted key — the CDC shape where one document updates constantly —
so the keep-last dedup window and the sink upsert key path can be
measured against a hot key owning ~1% of the corpus.
"""
import csv
import io
import os
import sys

SRC = "/root/reference/data/extracted"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/etl_corpus_10x"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10
HOT_FRAC = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
HOT_EVERY = round(1 / HOT_FRAC) if HOT_FRAC > 0 else 0
HOT_OID = "deadbeef" * 3  # 24 hex chars, the corpus oid shape
SENTINEL = "@@OID@@"

os.makedirs(DST, exist_ok=True)
files = sorted(f for f in os.listdir(SRC) if f.endswith(".csv"))
total_rows = 0
hot_count = 0  # global row counter for the deterministic hot selector
for fi, name in enumerate(files):
    with open(os.path.join(SRC, name), newline="", encoding="utf-8") as f:
        rows = list(csv.reader(f))
    header, body = rows[0], rows[1:]
    assert header[1] == "oid__id", f"{name}: unexpected header {header[:3]}"
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    w.writerow(header)
    oids = []
    for row in body:
        # The sentinel splice below writes f"{r}{oid}" into already-
        # CSV-encoded text without re-quoting, and split(SENTINEL)
        # assumes the sentinel never occurs in real data (ADVICE r13:
        # silent corpus corruption if the source shape drifts). Both
        # assumptions are asserted per-row so drift fails LOUDLY:
        # oids must stay in csv.writer's no-quoting charset (the
        # reference's are 24-hex-char Mongo ObjectIds), and no field
        # may contain the sentinel.
        assert all(c in "0123456789abcdefABCDEF" for c in row[1]) \
            and row[1], f"{name}: oid {row[1]!r} needs CSV quoting"
        assert not any(SENTINEL in field for field in row), \
            f"{name}: a field contains the sentinel {SENTINEL}"
        oids.append(row[1])
        row = list(row)
        row[1] = SENTINEL
        w.writerow(row)
    template = buf.getvalue().split(SENTINEL)
    assert len(template) == len(body) + 1
    for r in range(N):
        out = os.path.join(DST, f"r{r}_{name}")
        with open(out, "w", encoding="utf-8", newline="") as f:
            parts = [template[0]]
            for i, oid in enumerate(oids):
                hot_count += 1
                if HOT_EVERY and hot_count % HOT_EVERY == 0:
                    parts.append(HOT_OID)
                else:
                    parts.append(f"{r}{oid}")
                parts.append(template[i + 1])
            f.write("".join(parts))
    total_rows += len(body) * N
    if (fi + 1) % 100 == 0:
        print(f"{fi + 1}/{len(files)} files done")
hot_note = (f", hot key {HOT_OID} on ~1/{HOT_EVERY} of rows"
            if HOT_EVERY else "")
print(f"wrote {len(files) * N} files, {total_rows} raw rows -> {DST}{hot_note}")
