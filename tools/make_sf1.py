#!/usr/bin/env python3
"""Generate the sf1.0 scaling-probe dataset: 10 key-shifted copies of the
driver's sf0.1 tables (builder-side tool; /root/testdata itself is
read-only).

Design (recorded in SCALE.md round-13):
- DIMENSION tables (region, nation) are kept as-is — dimensions don't
  grow 10x when fact volume does, and literal dimension filters
  (c_nationkey = 1, ...) must keep selecting 10x the rows.
- Entity/fact keys (custkey, suppkey, partkey, orderkey, event_id,
  user_id, doc_id, vec_id) shift by copy * (max+1): ten disjoint
  sub-universes with intact referential integrity — uniform 10x rows on
  every join path.
- documents.text: copy c > 0 suffixes every word with "@c" (and n_chars
  is recomputed), so within-copy duplicate structure replicates exactly
  (10x the sf0.1 dup mass — linear, honest) while cross-copy text shares
  NOTHING; otherwise every doc would pair with its 9 clones and
  substring/LSH dedup would blow up ~45x by construction, not by
  algorithm. Vocabulary grows 10x (Heaps-pessimistic; fine for a probe).
- embeddings.embedding: copy c adds c*1e-3 to component 0 — keeps the
  cluster geometry while avoiding 10 exact duplicate points per vector.

Usage: python3 tools/make_sf1.py [outdir=/root/repo/testdata_sf1/sf1.0]
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1/sf1.0"
COPIES = 10

con = duckdb.connect()


def src(t):
    return f"'{SRC}/{t}.parquet'"


def write(t, sql):
    os.makedirs(OUT, exist_ok=True)
    con.execute(
        f"COPY ({sql}) TO '{OUT}/{t}.parquet' (FORMAT parquet)")
    n = con.execute(f"SELECT COUNT(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")


def offset(t, key):
    return con.execute(
        f"SELECT MAX({key}) + 1 FROM {src(t)}").fetchone()[0]


# dimensions: unchanged
for t in ("region", "nation"):
    write(t, f"SELECT * FROM {src(t)}")

CUST = offset("customer", "c_custkey")
SUPP = offset("supplier", "s_suppkey")
PART = offset("part", "p_partkey")
ORD = offset("orders", "o_orderkey")
EVT = offset("events", "event_id")
USR = offset("events", "user_id")
DOC = offset("documents", "doc_id")
VEC = offset("embeddings", "vec_id")

copies = f"(SELECT unnest(generate_series(0, {COPIES - 1})) AS c)"

write("customer", f"""
  SELECT c_custkey + c * {CUST} AS c_custkey, c_name, c_nationkey,
    c_acctbal, c_mktsegment
  FROM {src('customer')} CROSS JOIN {copies}""")

write("supplier", f"""
  SELECT s_suppkey + c * {SUPP} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM {src('supplier')} CROSS JOIN {copies}""")

write("part", f"""
  SELECT p_partkey + c * {PART} AS p_partkey, p_name, p_brand, p_type,
    p_size, p_retailprice
  FROM {src('part')} CROSS JOIN {copies}""")

write("orders", f"""
  SELECT o_orderkey + c * {ORD} AS o_orderkey,
    o_custkey + c * {CUST} AS o_custkey, o_orderstatus, o_totalprice,
    o_orderdate, o_orderpriority
  FROM {src('orders')} CROSS JOIN {copies}""")

write("lineitem", f"""
  SELECT l_orderkey + c * {ORD} AS l_orderkey,
    l_partkey + c * {PART} AS l_partkey,
    l_suppkey + c * {SUPP} AS l_suppkey,
    l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
    l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')} CROSS JOIN {copies}""")

write("events", f"""
  SELECT event_id + c * {EVT} AS event_id, ts,
    user_id + c * {USR} AS user_id, event_type, value, props
  FROM {src('events')} CROSS JOIN {copies}""")

write("documents", f"""
  SELECT doc_id + c * {DOC} AS doc_id,
    CASE WHEN c = 0 THEN text
      ELSE replace(text, ' ', '@' || c || ' ') || '@' || c END AS text,
    lang, source,
    CAST(strlen(CASE WHEN c = 0 THEN text
      ELSE replace(text, ' ', '@' || c || ' ') || '@' || c END) AS BIGINT)
      AS n_chars
  FROM {src('documents')} CROSS JOIN {copies}""")

write("embeddings", f"""
  SELECT vec_id + c * {VEC} AS vec_id,
    list_concat([embedding[1] + c * 0.001]::FLOAT[],
      embedding[2:])::FLOAT[] AS embedding,
    label
  FROM {src('embeddings')} CROSS JOIN {copies}""")

print("done ->", OUT)
