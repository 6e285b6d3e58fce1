#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare (rows / schema / values) against
the Spark parquet dump from graft.Verify. Dev-only tool — not part of the
library. Usage: check_oracle.py <sfDir> <verifyOutDir> [query...]"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    subset = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    fails = []
    for name in sorted(oracle):
        if subset and name not in subset:
            continue
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1; fails.append(name)
            continue
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1; fails.append(name)
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
        # driver compare: sort columns by name, then hash values
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"FAIL {name}: schema mismatch spark={scols} oracle={ocols}")
            n_fail += 1; fails.append(name)
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1; fails.append(name)
            continue
        sdf, odf = sdf[scols], odf[ocols]
        bad = None
        for c in scols:
            sv, ov = sdf[c].tolist(), odf[c].tolist()
            for i, (a, b) in enumerate(zip(sv, ov)):
                if a is None and b is None:
                    continue
                an = a is None or (isinstance(a, float) and a != a)
                bn = b is None or (isinstance(b, float) and b != b)
                if an and bn:
                    continue
                if an != bn:
                    bad = (c, i, a, b); break
                try:
                    import decimal
                    if isinstance(a, (int, float, decimal.Decimal)) and \
                       isinstance(b, (int, float, decimal.Decimal)):
                        if abs(float(a) - float(b)) > 1e-9 * max(1, abs(float(a))):
                            bad = (c, i, a, b); break
                    elif str(a) != str(b):
                        bad = (c, i, a, b); break
                except Exception:
                    if str(a) != str(b):
                        bad = (c, i, a, b); break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: value mismatch col={c} row={i} spark={a!r} oracle={b!r}")
            n_fail += 1; fails.append(name)
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if fails:
        print("failed:", " ".join(fails))
        sys.exit(1)

if __name__ == "__main__":
    main()
