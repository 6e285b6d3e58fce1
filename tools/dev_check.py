#!/usr/bin/env python3
"""Dev-only mirror of the driver's t2 correctness gate (NOT part of the
shipped library — the Scala engine never imports this). Runs each
oracle_sql.json query in DuckDB over the sf parquet tables and compares to
the Verify.scala parquet dumps: row count, column names (sorted), values.

Usage: dev_check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v

fails = []
for name in sorted(oracle):
    if only and name not in only:
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails.append(name); continue
    try:
        mine = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        mcols = sorted(mine.columns)
        mrows = con.sql(f"SELECT {', '.join(mcols)} FROM '{outdir}/{name}/*.parquet'").fetchall()
        ref = con.sql(oracle[name])
        rcols = sorted(ref.columns)
        # preserve oracle row order, project sorted columns
        rrows = con.sql(f"SELECT {', '.join(rcols)} FROM ({oracle[name]}) oq").fetchall()
    except Exception as e:
        print(f"FAIL {name}: error {e}"); fails.append(name); continue
    if mcols != rcols:
        print(f"FAIL {name}: cols mine={mcols} oracle={rcols}"); fails.append(name); continue
    if len(mrows) != len(rrows):
        print(f"FAIL {name}: rows mine={len(mrows)} oracle={len(rrows)}"); fails.append(name); continue
    bad = None
    for i, (a, b) in enumerate(zip(mrows, rrows)):
        if tuple(map(norm, a)) != tuple(map(norm, b)):
            bad = (i, a, b); break
    if bad:
        print(f"FAIL {name}: first diff at row {bad[0]}:\n  mine:   {bad[1]}\n  oracle: {bad[2]}")
        fails.append(name); continue
    print(f"ok   {name} ({len(mrows)} rows)")

# queries with no oracle: row-count-only report
for d in sorted(glob.glob(f"{outdir}/q_*")):
    name = d.split("/")[-1]
    if name not in oracle and (not only or name in only):
        try:
            n = con.sql(f"SELECT COUNT(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"ok   {name} [no-oracle] ({n} rows)")
        except Exception as e:
            print(f"FAIL {name} [no-oracle]: {e}"); fails.append(name)

print(f"\n{len(fails)} failures" + (": " + ", ".join(fails) if fails else ""))
sys.exit(1 if fails else 0)
