"""Build the sf1-equivalent stress-probe tables (SCALE.md §stress).

Replicates sf0.1's documents/embeddings 10× into REPLICAS disjoint
"shards" so the corpus grows without changing its duplicate-rate
profile:

- documents: every token gets a per-replica prefix (``r3_the``), so
  replicas share no vocabulary — cross-replica docs are NOT near-dups,
  exactly like growing a real corpus with fresh content. Within a
  replica the dup structure of sf0.1 is preserved verbatim.
- embeddings: components are rotated by the replica index (a norm-
  preserving permutation), so cross-replica cosines are ~random while
  each replica keeps sf0.1's neighborhood structure.

doc_id/vec_id are offset per replica to stay unique. Output is plain
parquet under .scratch/sf1ish/ (gitignored scratch — regenerate any
time; this script is the reproducibility record).

Usage: python tools/make_scale_probe.py [src_dir] [out_dir] [replicas] [tables]

``tables`` is an optional comma-list filter (e.g. ``lineitem``) for
single-family corpora — the graph-only sf40/sf60 probe dirs carry
just lineitem, at 1/6 the disk of the full schema.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else ".scratch/sf1ish"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None


def want(table: str) -> bool:
    return ONLY is None or table in ONLY

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW docs AS SELECT * FROM read_parquet('{SRC}/documents.parquet')")
con.execute(
    f"CREATE VIEW embs AS SELECT * FROM read_parquet('{SRC}/embeddings.parquet')"
)
n_docs = con.sql("SELECT max(doc_id) + 1 FROM docs").fetchone()[0]
n_vecs = con.sql("SELECT max(vec_id) + 1 FROM embs").fetchone()[0]
dim = con.sql("SELECT len(embedding) FROM embs LIMIT 1").fetchone()[0]

if want("documents"):
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + r.r * {n_docs} AS doc_id,
                 regexp_replace('r' || r.r || '_' || d.text, '(\\s+)',
                                '\\1r' || r.r || '_', 'g') AS text,
                 d.lang, d.source, d.n_chars
          FROM docs d CROSS JOIN (SELECT unnest(range({REPLICAS})) AS r) r
        ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
        """
    )
if want("embeddings"):
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + r.r * {n_vecs} AS vec_id,
                 CAST(e.embedding[(r.r % {dim}) + 1:] || e.embedding[1:(r.r % {dim})]
                      AS FLOAT[]) AS embedding,
                 e.label
          FROM embs e CROSS JOIN (SELECT unnest(range({REPLICAS})) AS r) r
        ) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
# Relational schema: disjoint key spaces per replica on EVERY
# SF-scaled entity (orderkey/partkey/suppkey/custkey, and user_id/
# event_id below), so graph, sequence and join structure all grow the
# way a real corpus does — more entities, same per-entity density.
# nation/region are TPC-H fixed-cardinality dims and copy verbatim.
# (Round 8: suppkey/custkey offsets + the customer/supplier/part
# replicas were added so the TPC-H headline subset probes at scale;
# the graph family only reads (l_orderkey, l_partkey) and is
# unaffected by the suppkey change.)
n_ord = con.sql("SELECT max(l_orderkey) + 1 FROM read_parquet('%s/lineitem.parquet')" % SRC).fetchone()[0]
n_part = con.sql("SELECT max(l_partkey) + 1 FROM read_parquet('%s/lineitem.parquet')" % SRC).fetchone()[0]
n_supp = con.sql("SELECT max(s_suppkey) + 1 FROM read_parquet('%s/supplier.parquet')" % SRC).fetchone()[0]
n_cust = con.sql("SELECT max(c_custkey) + 1 FROM read_parquet('%s/customer.parquet')" % SRC).fetchone()[0]
if want("lineitem"):
    con.execute(
        f"""
        COPY (
          SELECT l.* REPLACE (l.l_orderkey + r.r * {n_ord} AS l_orderkey,
                              l.l_partkey + r.r * {n_part} AS l_partkey,
                              l.l_suppkey + r.r * {n_supp} AS l_suppkey)
          FROM read_parquet('{SRC}/lineitem.parquet') l
          CROSS JOIN (SELECT unnest(range({REPLICAS})) AS r) r
        ) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
if want("orders"):
    con.execute(
        f"""
        COPY (
          SELECT o.* REPLACE (o.o_orderkey + r.r * {n_ord} AS o_orderkey,
                              o.o_custkey + r.r * {n_cust} AS o_custkey)
          FROM read_parquet('{SRC}/orders.parquet') o
          CROSS JOIN (SELECT unnest(range({REPLICAS})) AS r) r
        ) TO '{OUT}/orders.parquet' (FORMAT PARQUET)
        """
    )
if want("customer"):
    con.execute(
        f"""
        COPY (
          SELECT c.* REPLACE (c.c_custkey + r.r * {n_cust} AS c_custkey)
          FROM read_parquet('{SRC}/customer.parquet') c
          CROSS JOIN (SELECT unnest(range({REPLICAS})) AS r) r
        ) TO '{OUT}/customer.parquet' (FORMAT PARQUET)
        """
    )
if want("supplier"):
    con.execute(
        f"""
        COPY (
          SELECT s.* REPLACE (s.s_suppkey + r.r * {n_supp} AS s_suppkey)
          FROM read_parquet('{SRC}/supplier.parquet') s
          CROSS JOIN (SELECT unnest(range({REPLICAS})) AS r) r
        ) TO '{OUT}/supplier.parquet' (FORMAT PARQUET)
        """
    )
if want("part"):
    con.execute(
        f"""
        COPY (
          SELECT p.* REPLACE (p.p_partkey + r.r * {n_part} AS p_partkey)
          FROM read_parquet('{SRC}/part.parquet') p
          CROSS JOIN (SELECT unnest(range({REPLICAS})) AS r) r
        ) TO '{OUT}/part.parquet' (FORMAT PARQUET)
        """
    )
for dim in ("nation", "region"):
    if not want(dim):
        continue
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/{dim}.parquet')) "
        f"TO '{OUT}/{dim}.parquet' (FORMAT PARQUET)"
    )
n_usr = con.sql("SELECT max(user_id) + 1 FROM read_parquet('%s/events.parquet')" % SRC).fetchone()[0]
n_ev = con.sql("SELECT max(event_id) + 1 FROM read_parquet('%s/events.parquet')" % SRC).fetchone()[0]
if want("events"):
    con.execute(
        f"""
        COPY (
          SELECT e.* REPLACE (e.event_id + r.r * {n_ev} AS event_id,
                              e.user_id + r.r * {n_usr} AS user_id)
          FROM read_parquet('{SRC}/events.parquet') e
          CROSS JOIN (SELECT unnest(range({REPLICAS})) AS r) r
        ) TO '{OUT}/events.parquet' (FORMAT PARQUET)
        """
    )
for t in (
    "documents", "embeddings", "lineitem", "orders", "events",
    "customer", "supplier", "part", "nation", "region",
):
    if not want(t):
        continue
    print(t, con.sql(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0])
