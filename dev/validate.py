#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 dev/validate.py [sfDir] [outDir]

Runs DuckDB on each oracle_sql.json entry (tables = parquet files in
sfDir) and compares against the Spark parquet dumps produced by
`sbt "runMain graft.Verify <sfDir> <outDir>"`: column names sorted,
rows sorted, values compared exactly (floats via repr equality).

Dev-only tooling: the shipped Scala library has no Python dependency.
"""
import sys, os, json, glob
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
failures = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output dir"); failures += 1; continue
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); failures += 1; continue
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark parquet"); failures += 1; continue
    # read the Spark side with pyarrow (NOT duckdb): the driver's gate uses
    # asymmetric readers, and pyarrow preserves decimal scale ("1.00") where
    # duckdb->pandas yields float64 ("1.0") — reading both sides through
    # duckdb would mask exactly the representation drift we must catch
    import pandas as pd
    sdf = pd.read_parquet(spark_dir)
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        print(f"FAIL {name}: columns differ oracle={ocols} spark={scols}")
        failures += 1; continue
    o = odf[ocols].sort_values(ocols).reset_index(drop=True)
    s = sdf[scols].sort_values(scols).reset_index(drop=True)
    if len(o) != len(s):
        print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
        failures += 1; continue
    # exact value compare, cell by cell via string repr
    mism = []
    for c in ocols:
        ov, sv = o[c].astype(str).tolist(), s[c].astype(str).tolist()
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(ov, sv)) if a != b]
        if bad:
            mism.append((c, bad[:3]))
    if mism:
        print(f"FAIL {name}: value mismatches {mism[:2]}")
        failures += 1; continue
    print(f"OK   {name} ({len(o)} rows)")
print(f"\n{'ALL GREEN' if failures == 0 else str(failures) + ' FAILURES'} / {len(oracle)} queries")
sys.exit(1 if failures else 0)
