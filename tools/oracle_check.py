#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate: runs each
oracle SQL from <outDir>/oracle_sql.json against the sf parquet tables and
compares row sets (columns sorted by name, rows sorted, values normalized)
with the Spark-written parquet in <outDir>/<query>/."""
import sys, json, glob, math
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool): return str(int(v))
    if v is None: return "<null>"
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out

fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        o = con.execute(sql)
        ocols = [d[0] for d in o.description]
        orows = o.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:200]}")
        fails += 1
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark parquet")
        fails += 1
        continue
    s = con.execute(f"SELECT * FROM read_parquet({files!r})")
    scols = [d[0] for d in s.description]
    srows = s.fetchall()
    oc, orw = canon(ocols, orows)
    sc, srw = canon(scols, srows)
    if oc != sc:
        print(f"FAIL {name}: schema {sc} vs oracle {oc}")
        fails += 1
    elif orw != srw:
        diff = [(a, b) for a, b in zip(srw, orw) if a != b][:3]
        extra = f" rows {len(srw)} vs {len(orw)}" if len(srw) != len(orw) else ""
        print(f"FAIL {name}: value mismatch{extra}; first diffs: {diff}")
        fails += 1
    else:
        print(f"PASS {name} ({len(srw)} rows)")

no_oracle = [d.split('/')[-1] for d in sorted(glob.glob(f"{out_dir}/q*")) if d.split('/')[-1] not in oracle]
for name in no_oracle:
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
    print(f"{'ROWS' if n > 0 else 'EMPTY'} {name} ({n} rows, no oracle)")
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
