#!/usr/bin/env python3
"""Dev-only mirror of the driver's t2 correctness gate (NOT part of the
shipped library — the Scala engine never imports this). Faithful to the
driver's observed behavior (r2 forensics): the Spark parquet is read via
pandas/pyarrow, the oracle via duckdb .df(), and VALUES ARE COMPARED AS
STRINGS — so a DECIMAL column on the Spark side (python Decimal,
str "43683.060000") mismatches the oracle's float64 ("43683.06") even when
numerically equal, and a DuckDB HUGEINT aggregate (float64 "1000.0")
mismatches Spark's int64 ("1000"). Queries must emit DOUBLE/BIGINT/VARCHAR/
TIMESTAMP/BOOLEAN only; see graft.QueryDef's OUTPUT-TYPE contract.

Usage: dev_check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, glob
import json
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

fails = []
for name in sorted(oracle):
    if only and name not in only:
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails.append(name); continue
    try:
        mine = pd.read_parquet(f"{outdir}/{name}")
        ref = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: error {e}"); fails.append(name); continue
    mcols, rcols = sorted(mine.columns), sorted(ref.columns)
    if mcols != rcols:
        print(f"FAIL {name}: cols mine={mcols} oracle={rcols}"); fails.append(name); continue
    if len(mine) != len(ref):
        print(f"FAIL {name}: rows mine={len(mine)} oracle={len(ref)}"); fails.append(name); continue
    mine, ref = mine[mcols], ref[rcols]
    bad = None
    for c in mcols:
        a = mine[c].astype(str).values
        b = ref[c].astype(str).values
        neq = a != b
        if neq.any():
            i = int(neq.argmax())
            bad = (c, i, a[i], b[i],
                   type(mine[c].iloc[i]).__name__, type(ref[c].iloc[i]).__name__)
            break
    if bad:
        c, i, av, bv, at, bt = bad
        print(f"FAIL {name}: col {c} row {i}: mine={av!r} ({at}) oracle={bv!r} ({bt})")
        fails.append(name); continue
    print(f"ok   {name} ({len(mine)} rows)")

# queries with no oracle: row-count-only report
for d in sorted(glob.glob(f"{outdir}/q_*")):
    name = d.split("/")[-1]
    if name not in oracle and (not only or name in only):
        try:
            n = len(pd.read_parquet(d))
            print(f"ok   {name} [no-oracle] ({n} rows)")
        except Exception as e:
            print(f"FAIL {name} [no-oracle]: {e}"); fails.append(name)

print(f"\n{len(fails)} failures" + (": " + ", ".join(fails) if fails else ""))
sys.exit(1 if fails else 0)
