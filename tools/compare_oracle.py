#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracle parity, mimicking the driver:
for each query dir under OUT, read the Spark parquet result, run the
oracle SQL from oracle_sql.json in DuckDB over the sf tables, sort
columns by name + rows by all columns, and compare values."""
import sys, json, glob, math
import duckdb
import pandas as pd

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
# subset runs (graft.Verify with a names arg) leave most queries without
# a Spark dump; GRAFT_ONLY_EXISTING=1 compares just the dumped ones
import os
if os.environ.get("GRAFT_ONLY_EXISTING") == "1":
    oracle = {k: v for k, v in oracle.items()
              if os.path.isdir(f"{OUT}/{k}")}

def deep_tuple(v):
    """Recursively convert ndarrays/lists/dicts (incl. nested inside structs)
    to hashable tuples so array-valued cells sort/compare instead of crashing."""
    if hasattr(v, "tolist"):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return tuple(deep_tuple(x) for x in v)
    if isinstance(v, dict):
        return tuple((k, deep_tuple(x)) for k, x in sorted(v.items()))
    return v

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(deep_tuple)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.map(lambda v: (v is not None and v == v, v)))
    return df

def eq(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b or abs(a - b) < 1e-9 * max(1, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    try:
        return a == b or str(a) == str(b)
    except Exception:
        return False

fails, passes = [], []
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        fails.append((name, "NO SPARK RESULT")); continue
    try:
        spark_df = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
    except Exception as e:
        fails.append((name, f"read error: {e}")); continue
    try:
        duck_df = norm(con.execute(sql).fetchdf())
    except Exception as e:
        fails.append((name, f"DUCKDB SQL ERROR: {e}")); continue
    if list(spark_df.columns) != list(duck_df.columns):
        fails.append((name, f"SCHEMA: spark={list(spark_df.columns)} duck={list(duck_df.columns)}")); continue
    if len(spark_df) != len(duck_df):
        fails.append((name, f"ROWS: spark={len(spark_df)} duck={len(duck_df)}")); continue
    bad = None
    for i in range(len(spark_df)):
        for c in spark_df.columns:
            a, b = spark_df.iloc[i][c], duck_df.iloc[i][c]
            a = None if (a is pd.NaT or (isinstance(a, float) and pd.isna(a) and not isinstance(a, float))) else a
            if not eq(a if not pd.api.types.is_scalar(a) or not pd.isna(a) else None if not isinstance(a, float) else a,
                      b if not pd.api.types.is_scalar(b) or not pd.isna(b) else None if not isinstance(b, float) else b):
                bad = (i, c, a, b); break
        if bad: break
    if bad:
        fails.append((name, f"VALUE row{bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}"))
    else:
        passes.append(name)

print(f"PASS {len(passes)}: {' '.join(passes)}")
print(f"FAIL {len(fails)}:")
for n, msg in fails:
    print(f"  {n}: {msg[:300]}")
# rows-only queries
for d in sorted(glob.glob(f"{OUT}/*/")):
    n = d.rstrip("/").split("/")[-1]
    if n not in oracle:
        files = glob.glob(f"{d}/*.parquet")
        rows = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"  rows-only {n}: {rows} rows")
