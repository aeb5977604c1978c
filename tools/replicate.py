#!/usr/bin/env python3
"""Dev-only scale-replica generator (the N× experiment of SURVEY §5).

Usage: python3 tools/replicate.py <baseDir> <outDir> <factor>

Replicates the FACT tables factor× under consistent key offsets
(copy k shifts each table's primary key by k*ceil(max_key+1)):
lineitem/orders share the orderkey offset so joins stay consistent;
documents/embeddings keep their text/vector payloads identical across
copies, producing factor-way duplicate groups — the duplicate-heavy
shape real dedup corpora have. Dimension tables are copied verbatim.
Not shipped; Scala library code lives in src/.
"""
import os
import sys

import duckdb

base, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(out, exist_ok=True)
con = duckdb.connect()


def copy(table):
    con.execute(f"""COPY (SELECT * FROM '{base}/{table}.parquet')
                    TO '{out}/{table}.parquet' (FORMAT PARQUET)""")


def replicate(table, sql_per_copy):
    selects = " UNION ALL ".join(
        sql_per_copy.format(k=k) for k in range(factor))
    con.execute(f"""COPY ({selects}) TO '{out}/{table}.parquet'
                    (FORMAT PARQUET)""")


for t in ["region", "nation", "customer", "supplier", "part"]:
    copy(t)

okey_off = con.sql(
    f"SELECT max(o_orderkey) + 1 FROM '{base}/orders.parquet'").fetchone()[0]
replicate("orders", f"""
  SELECT o_orderkey + {{k}} * {okey_off} AS o_orderkey,
         * EXCLUDE (o_orderkey)
  FROM '{base}/orders.parquet'""")
replicate("lineitem", f"""
  SELECT l_orderkey + {{k}} * {okey_off} AS l_orderkey,
         * EXCLUDE (l_orderkey)
  FROM '{base}/lineitem.parquet'""")

ev_off = con.sql(
    f"SELECT max(event_id) + 1 FROM '{base}/events.parquet'").fetchone()[0]
replicate("events", f"""
  SELECT event_id + {{k}} * {ev_off} AS event_id, * EXCLUDE (event_id)
  FROM '{base}/events.parquet'""")

doc_off = con.sql(
    f"SELECT max(doc_id) + 1 FROM '{base}/documents.parquet'").fetchone()[0]
replicate("documents", f"""
  SELECT doc_id + {{k}} * {doc_off} AS doc_id, * EXCLUDE (doc_id)
  FROM '{base}/documents.parquet'""")

vec_off = con.sql(
    f"SELECT max(vec_id) + 1 FROM '{base}/embeddings.parquet'").fetchone()[0]
replicate("embeddings", f"""
  SELECT vec_id + {{k}} * {vec_off} AS vec_id, * EXCLUDE (vec_id)
  FROM '{base}/embeddings.parquet'""")

for t in ["orders", "lineitem", "events", "documents", "embeddings"]:
    n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
