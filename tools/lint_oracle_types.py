#!/usr/bin/env python3
"""Oracle output-type lint (VERDICT r15 #2a).

DuckDB silently widens integer SUM to HUGEINT (int128). A
pandas-converting client (the driver's harness) coerces HUGEINT to
float64, so a value the Spark side emits as BIGINT "8" canonicalizes as
"8.0" on the oracle side — hash red with rows and schema green. That
signature cost five rounds (q87/q89/q123/q132/q146/q147/q151). This lint
makes the class unreintroducible: resolve every oracle's result column
types via `DESCRIBE SELECT ...` (no execution) and assert each is in the
driver-safe set. Any HUGEINT/UHUGEINT/DECIMAL output means the oracle
needs an explicit CAST (typically `CAST(SUM(x) AS BIGINT)`).

Usage: lint_oracle_types.py [sf_dir] [oracle_sql.json]
Exit 0 iff every output column of every oracle is driver-safe.
Run from HarnessSpec ("oracle output types are driver-safe") and by hand.
"""
import sys, json
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
oracle_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"

# Types that survive the driver's pandas fetch without changing their
# canonical string form relative to the Spark parquet side.
ALLOWED = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "VARCHAR", "DOUBLE",
           "FLOAT", "BOOLEAN", "TIMESTAMP", "DATE"}

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracles = json.load(open(oracle_json))

def ok_type(t):
    t = t.strip()
    if t.endswith("[]"):           # list column: element type must be safe
        return ok_type(t[:-2])
    return t.split("(")[0].strip() in ALLOWED

bad = []
for name in sorted(oracles):
    try:
        desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
    except Exception as e:
        bad.append((name, f"DESCRIBE failed: {type(e).__name__}: {e}"))
        continue
    for row in desc:
        colname, coltype = row[0], row[1]
        if not ok_type(coltype):
            bad.append((name, f"{colname}: {coltype}"))

for name, msg in bad:
    print(f"BAD  {name}: {msg}")
print(f"\n{len(oracles)-len(set(n for n,_ in bad))}/{len(oracles)} oracles have driver-safe output types")
sys.exit(1 if bad else 0)
