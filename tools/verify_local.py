#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Runs each oracle SQL in DuckDB over the sf tables, loads the Spark-side
parquet dumps written by graft.Verify, and compares: column names
(sorted), dtypes, row count, and values in row order.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>
(run `java ... graft.Verify <sfDir> <outDir>` first — see tools/run_verify.sh)
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}"); n_fail += 1; continue
        sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}"); n_fail += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}"); n_fail += 1; continue
        spark_df, duck_df = spark_df[sc], duck_df[sc]
        bad = None
        for c in sc:
            a, b = spark_df[c], duck_df[c]
            try:
                if str(a.dtype) != str(b.dtype):
                    # dtype mismatch is suspicious but compare values anyway
                    bad_t = f"dtype {a.dtype} vs {b.dtype}"
                else:
                    bad_t = None
                neq = (a != b) & ~(a.isna() & b.isna())
                if neq.any():
                    i = neq.idxmax()
                    bad = f"col {c}: row {i}: {a[i]!r} vs {b[i]!r}"
                    break
                if bad_t:
                    bad = bad_t + f" (col {c}, values equal)"
                    break
            except Exception as e:
                bad = f"col {c}: compare error {e}"; break
        if bad:
            print(f"FAIL {name}: {bad}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
