#!/usr/bin/env python3
"""Build sf1-scale benchmark inputs (10x sf0.1) for the scaling-curve run.

NOT correctness testdata — the oracle still runs on the driver-generated
sf dirs. This exists solely to measure per-query time ratios sf1/sf0.1
and catch super-linear plans (VERDICT r4 item 6: "one sf1 bench run").

Construction: 10 key-shifted replicas of every sf0.1 fact table, dims
(region/nation) kept as-is. Shifts preserve referential integrity within
each replica. Content columns are perturbed so the DUPLICATE/NEAR-DUP
structure scales linearly (10x the sf0.1 pair structure), the way a real
10x corpus would, instead of every row acquiring 9 planted clones:
  - documents.text: every word gets a per-replica suffix => shingle sets
    are disjoint across replicas, within-replica structure unchanged.
  - embeddings.embedding: per-replica circular rotation of the dimension
    axis => norms/distributions preserved, cross-replica cosine ~random.
  - events.ts kept: windows/sessions just get 10x density (users are
    replica-distinct, so session structure is 10 copies of sf0.1's).
"""
import duckdb, os, sys

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10  # replicas (20 = sf2)

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")

def write(name, sql):
    out = f"{DST}/{name}.parquet"
    con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"{name}: {n} rows")

rep = f"(SELECT unnest(range({R})) AS r) reps"

# dims unchanged
for t in ("region", "nation"):
    write(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

# key shift = r * (max_key + 1) per key domain, computed once
def mx(tbl, col):
    return con.execute(
        f"SELECT max({col}) + 1 FROM '{SRC}/{tbl}.parquet'").fetchone()[0]

ck, ok, pk, sk = (mx("customer", "c_custkey"), mx("orders", "o_orderkey"),
                  mx("part", "p_partkey"), mx("supplier", "s_suppkey"))
ek, uk = mx("events", "event_id"), mx("events", "user_id")
dk, vk = mx("documents", "doc_id"), mx("embeddings", "vec_id")

write("customer", f"""
  SELECT c_custkey + r*{ck} AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment
  FROM '{SRC}/customer.parquet', {rep}""")

write("supplier", f"""
  SELECT s_suppkey + r*{sk} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet', {rep}""")

write("part", f"""
  SELECT p_partkey + r*{pk} AS p_partkey, p_name, p_brand, p_type, p_size,
         p_retailprice
  FROM '{SRC}/part.parquet', {rep}""")

write("orders", f"""
  SELECT o_orderkey + r*{ok} AS o_orderkey, o_custkey + r*{ck} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet', {rep}""")

write("lineitem", f"""
  SELECT l_orderkey + r*{ok} AS l_orderkey, l_partkey + r*{pk} AS l_partkey,
         l_suppkey + r*{sk} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM '{SRC}/lineitem.parquet', {rep}""")

write("events", f"""
  SELECT event_id + r*{ek} AS event_id, ts, user_id + r*{uk} AS user_id,
         event_type, value, props
  FROM '{SRC}/events.parquet', {rep}""")

# per-replica word suffix: replica 0 keeps the original text
write("documents", f"""
  SELECT doc_id + r*{dk} AS doc_id,
         CASE WHEN r = 0 THEN text
              ELSE array_to_string(
                     list_transform(string_split(text, ' '),
                                    w -> w || 'r' || r::VARCHAR), ' ')
         END AS text,
         lang, source, length(CASE WHEN r = 0 THEN text
              ELSE array_to_string(
                     list_transform(string_split(text, ' '),
                                    w -> w || 'r' || r::VARCHAR), ' ')
         END)::BIGINT AS n_chars
  FROM '{SRC}/documents.parquet', {rep}""")

# per-replica circular rotation of the embedding dims (r=0 unchanged)
write("embeddings", f"""
  SELECT vec_id + r*{vk} AS vec_id,
         (embedding[(len(embedding) - (3*r) % len(embedding) + 1):] ||
          embedding[:(len(embedding) - (3*r) % len(embedding))])::FLOAT[]
           AS embedding,
         label
  FROM '{SRC}/embeddings.parquet', {rep}""")

print("done ->", DST)
