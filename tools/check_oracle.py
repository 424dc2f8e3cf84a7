#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles against DuckDB, mimicking the
driver's compare: for each query, read the Spark parquet dump and run the
oracle SQL in DuckDB over the same source tables; compare schema (sorted
column names), row count, and a canonical value hash."""
import sys, json, glob, math, hashlib
import duckdb

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
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for l in lines: h.update(l.encode()); h.update(b"\n")
    return h.hexdigest()

fails = []
for name in sorted(oracles):
    try:
        sp = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        sp_cols = [d[0] for d in sp.description]; sp_rows = sp.fetchall()
        du = con.execute(oracles[name])
        du_cols = [d[0] for d in du.description]; du_rows = du.fetchall()
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
