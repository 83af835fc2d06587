#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads the parquet dumps Verify.scala wrote to OUTDIR, runs each oracle
SQL from oracle_sql.json in DuckDB over the same sf tables, and compares:
row count, schema (sorted column names), and a value hash computed over
columns sorted by name (rows compared in written/returned order, and also
order-insensitively as a fallback diagnostic).

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df

fails = []
for name in sorted(oracle):
    qdir = os.path.join(outdir, name)
    files = glob.glob(os.path.join(qdir, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output")
        fails.append(name)
        continue
    got = pq.read_table(files[0]).to_pandas()
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails.append(name)
        continue
    g, e = normalize(got), normalize(exp)
    status = []
    if list(g.columns) != list(e.columns):
        status.append(f"schema: spark={list(g.columns)} duck={list(e.columns)}")
    elif len(g) != len(e):
        status.append(f"rows: spark={len(g)} duck={len(e)}")
    else:
        # elementwise with NaN handling; dtype-STRICT first — the driver
        # hashes typed values, so int64-vs-float64 (e.g. DuckDB HUGEINT
        # from SUM(BIGINT) materialized as float64) must fail here even
        # though numpy says 3 == 3.0.
        mism = []
        for ci, c in enumerate(g.columns):
            a, b = g[c].values, e[c].values
            da, db = np.asarray(a).dtype, np.asarray(b).dtype
            # kind-strict: int-vs-float (e.g. DuckDB HUGEINT materialized
            # as float64 vs Spark int64) must fail, like the driver's
            # typed hash; width (int32 vs int64) hashes identically there
            ka = "i" if da.kind in "iu" else da.kind
            kb = "i" if db.kind in "iu" else db.kind
            if ka != kb:
                mism.append(f"col {c}: dtype kind spark={da} duck={db}")
                continue
            if np.issubdtype(np.asarray(a).dtype, np.floating):
                bad = ~((a == b) | (np.isnan(a.astype(float)) & np.isnan(b.astype(float))))
            else:
                bad = ~(pd.Series(a).fillna("§null§").values ==
                        pd.Series(b).fillna("§null§").values)
            if bad.any():
                i = int(np.argmax(bad))
                mism.append(f"col {c}: {int(bad.sum())} diffs, first@row{i}: "
                            f"spark={a[i]!r} duck={b[i]!r}")
        if mism:
            status.append("; ".join(mism[:3]))
    if status:
        print(f"FAIL {name}: {'; '.join(status)}")
        fails.append(name)
    else:
        print(f"PASS {name} ({len(g)} rows, {len(g.columns)} cols)")

nq = len(oracle)
print(f"\n{nq - len(fails)}/{nq} oracle queries pass")
sys.exit(1 if fails else 0)
