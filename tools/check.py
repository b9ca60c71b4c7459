#!/usr/bin/env python3
"""Dev-only parity harness (mimics the driver's DuckDB oracle compare).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <outDir>/oracle_sql.json, runs each oracle in DuckDB with the
parquet tables registered as views, reads the Spark result parquet,
sorts columns by name + rows by all columns, and diffs values exactly.
NOT part of the shipped library — driver-side python only.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    dtypes = [str(t) for t in df.dtypes]
    rows = df.values.tolist()
    def key(r):
        return [(x is None, str(type(x)), str(x)) for x in r]
    rows.sort(key=key)
    return cols, dtypes, rows

def eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    if "__subset__" in oracles:
        print(f"NOTE: subset run (SPARK_GRAFT_ONLY={oracles.pop('__subset__')!r}) "
              "— not a full-inventory pass")
    for name, sql in sorted(oracles.items()):
        try:
            orel = con.sql(sql)
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            srel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            # The driver's hash canonicalizes DECIMAL/HUGEINT output
            # columns differently per engine (round-14: 9 value-equal
            # queries hash-failed on DECIMAL(38,0) report columns;
            # this harness read both sides through DuckDB and missed
            # it). Reject the representation class outright so the
            # local harness predicts the gate.
            wide = [(c, str(t)) for c, t in zip(orel.columns, orel.types)
                    if str(t).startswith("DECIMAL") or str(t) == "HUGEINT"]
            wide += [(c, str(t)) for c, t in zip(srel.columns, srel.types)
                     if str(t).startswith("DECIMAL") or str(t) == "HUGEINT"]
            if wide:
                print(f"FAIL {name}: decimal-class output columns {wide} "
                      "(driver hash cannot canonicalize; cast to BIGINT)")
                n_fail += 1
                continue
            odf = orel.df()
            sdf = srel.df()
            ocols, odts, orows = canon(odf)
            scols, sdts, srows = canon(sdf)
            if ocols != scols:
                print(f"FAIL {name}: columns oracle={ocols} spark={scols}")
                n_fail += 1
                continue
            # the driver's hash is dtype-representation-sensitive
            # (DuckDB HUGEINT sums land as float64) — mimic that here
            if odts != sdts:
                print(f"FAIL {name}: dtypes oracle={list(zip(ocols, odts))} "
                      f"spark={list(zip(scols, sdts))}")
                n_fail += 1
                continue
            if len(orows) != len(srows):
                print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}")
                n_fail += 1
                continue
            bad = None
            for i, (orow, srow) in enumerate(zip(orows, srows)):
                for c, (a, b) in enumerate(zip(orow, srow)):
                    pa = None if (isinstance(a, float) and math.isnan(a)) else a
                    pb = None if (isinstance(b, float) and math.isnan(b)) else b
                    if not eq(pa, pb):
                        bad = (i, ocols[c], a, b)
                        break
                if bad:
                    break
            if bad:
                print(f"FAIL {name}: row {bad[0]} col {bad[1]}: oracle={bad[2]!r} spark={bad[3]!r}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(orows)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
