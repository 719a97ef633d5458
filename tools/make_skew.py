#!/usr/bin/env python3
"""Plant a power-law on the sf1 bench inputs (VERDICT r9 ask 3).

NOT correctness testdata — like make_sf1.py this exists only to measure
per-query time under skew vs. the uniform sf1 inputs, proving the
salted/capped paths (q64 runtime skew split, d02 hot-shingle star
degradation, AQE skew-join config) hold when the data actually IS
skewed, not just on the uniform-ish generator output.

Planted skew (all deterministic — hash-bucketed on stable ids):
  - orders.o_custkey: ~30% of ALL orders reassigned to ONE hot customer
    (custkey 0) -> every customer⋈orders join and per-customer aggregate
    has a single key owning a third of the fact table.
  - events.user_id:   ~30% of ALL events reassigned to ONE hot user
    (user_id 0) -> per-user windows/sessions get one giant partition.
  - documents.text:   ~30% of docs get the same appended boilerplate
    sentence -> one shingle family with df ~ 15k >> the 1000 cap, the
    exact stop-shingle / star-degradation / prefix-filter stress case.

Everything else is copied through unchanged so time deltas isolate the
skew response. Usage: python3 tools/make_skew.py [SRC] [DST]
"""
import duckdb, os, sys

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1skew"

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")

def write(name, sql):
    out = f"{DST}/{name}.parquet"
    con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"{name}: {n} rows")

# untouched tables: straight copies
for t in ("region", "nation", "customer", "supplier", "part",
          "lineitem", "embeddings"):
    write(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

# hash(id) % 10 < 3 is the deterministic 30% selector everywhere
write("orders", f"""
  SELECT o_orderkey,
         CASE WHEN hash(o_orderkey) % 10 < 3 THEN 0
              ELSE o_custkey END AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet'""")

write("events", f"""
  SELECT event_id, ts,
         CASE WHEN hash(event_id) % 10 < 3 THEN 0
              ELSE user_id END AS user_id,
         event_type, value, props
  FROM '{SRC}/events.parquet'""")

BOILER = " the quick brown fox jumps over the lazy dog"
write("documents", f"""
  SELECT doc_id,
         CASE WHEN hash(doc_id) % 10 < 3 THEN text || '{BOILER}'
              ELSE text END AS text,
         lang, source,
         length(CASE WHEN hash(doc_id) % 10 < 3 THEN text || '{BOILER}'
              ELSE text END)::BIGINT AS n_chars
  FROM '{SRC}/documents.parquet'""")

q = con.execute(f"""
  SELECT (SELECT count(*) FILTER (o_custkey = 0)::DOUBLE / count(*)
          FROM '{DST}/orders.parquet'),
         (SELECT count(*) FILTER (user_id = 0)::DOUBLE / count(*)
          FROM '{DST}/events.parquet'),
         (SELECT count(*) FILTER (text LIKE '%lazy dog')::DOUBLE / count(*)
          FROM '{DST}/documents.parquet')""").fetchone()
print(f"hot shares: orders {q[0]:.3f}, events {q[1]:.3f}, docs {q[2]:.3f}")
print("done ->", DST)
