#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles against DuckDB, mimicking the
driver's compare: for each query, read the Spark parquet dump and run the
oracle SQL in DuckDB over the same source tables; compare schema (sorted
column names), row count, and a canonical value hash.

VERDICT r15 #2b: fetch BOTH sides via the pandas path (`.df()`), not
`fetchall()`. DuckDB silently widens integer SUM to HUGEINT, and a
pandas-converting client coerces HUGEINT to float64 — canonicalizing
"8.0" where the Spark BIGINT side reads "8". The old fetchall() mimic got
Python ints on both sides and was blind to that whole divergence class
for five rounds (q87/q89/q123/q132/q146/q147/q151). Fetching via .df()
makes the local gate canonicalize the way the driver's harness does.
"""
import sys, json, glob, math, hashlib
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool): return str(int(v))
    # numpy scalars stringify like their Python counterparts except for
    # bool_/datetime64; normalize through .item() when available
    item = getattr(v, "item", None)
    if item is not None and not isinstance(v, (str, bytes)):
        try: return canon(v.item())
        except Exception: pass
    if v is pd.NaT: return "NULL"
    return str(v)

def fetch(rel):
    """Fetch a DuckDB relation the way a pandas client does."""
    df = rel.df()
    cols = list(df.columns)
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
    return cols, rows

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for l in lines: h.update(l.encode()); h.update(b"\n")
    return h.hexdigest()

fails = []
for name in sorted(oracles):
    try:
        sp_cols, sp_rows = fetch(con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
        du_cols, du_rows = fetch(con.sql(oracles[name]))
        if sorted(sp_cols) != sorted(du_cols):
            fails.append(name); print(f"FAIL {name}: cols spark={sorted(sp_cols)} duck={sorted(du_cols)}"); continue
        if len(sp_rows) != len(du_rows):
            fails.append(name); print(f"FAIL {name}: rows spark={len(sp_rows)} duck={len(du_rows)}"); continue
        hs, hd = table_hash(sp_cols, sp_rows), table_hash(du_cols, du_rows)
        if hs != hd:
            fails.append(name)
            print(f"FAIL {name}: hash mismatch ({len(sp_rows)} rows)")
            order = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
            sset = sorted("|".join(canon(r[i]) for i in order) for r in sp_rows)
            dset = sorted("|".join(canon(r[i]) for i in order) for r in du_rows)
            shown = 0
            for a, b in zip(sset, dset):
                if a != b:
                    print(f"  spark: {a[:200]}\n  duck : {b[:200]}")
                    shown += 1
                    if shown >= 3: break
        else:
            print(f"ok   {name} ({len(sp_rows)} rows)")
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: {type(e).__name__}: {e}")

# oracle-less queries: rows-only check
for d in sorted(glob.glob(f"{out_dir}/q*")):
    name = d.split("/")[-1]
    if name not in oracles:
        n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
        print(f"rows {name}: {n}")

print(f"\n{len(oracles)-len(fails)}/{len(oracles)} oracle queries match")
sys.exit(1 if fails else 0)
