#!/usr/bin/env python3
"""Dev-only local mimic of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <outDir>/<name> parquet (Spark output), runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables registered as views
over <sfDir>/*.parquet), sorts columns by name and rows by all columns,
and compares values exactly. Not shipped; Scala library code lives in
src/.
"""
import sys, os, json, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))

def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (a == b) or (math.isnan(a) and math.isnan(b))
    return a == b

fails = 0
for name, sql in sorted(oracle.items()):
    spark_path = os.path.join(outdir, name)
    if not os.path.isdir(spark_path):
        print(f"MISSING  {name}: no spark output")
        fails += 1
        continue
    sdf = con.execute(f"SELECT * FROM '{spark_path}/*.parquet'")
    scols = [d[0] for d in sdf.description]
    srows = sdf.fetchall()
    try:
        odf = con.execute(sql)
        ocols = [d[0] for d in odf.description]
        orows = odf.fetchall()
    except Exception as e:
        print(f"SQLERR   {name}: {e}")
        fails += 1
        continue
    sc, sr = norm(srows, scols)
    oc, orr = norm(orows, ocols)
    if sc != oc:
        print(f"SCHEMA   {name}: spark={sc} oracle={oc}")
        fails += 1
        continue
    if len(sr) != len(orr):
        print(f"ROWCOUNT {name}: spark={len(sr)} oracle={len(orr)}")
        fails += 1
        continue
    bad = None
    for i, (a, b) in enumerate(zip(sr, orr)):
        if not all(eq(x, y) for x, y in zip(a, b)):
            bad = (i, a, b)
            break
    if bad:
        print(f"VALUE    {name}: row {bad[0]}\n  spark : {bad[1]}\n  oracle: {bad[2]}")
        fails += 1
    else:
        print(f"OK       {name} ({len(sr)} rows)")

print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
